package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** IVF (inverted-file) approximate nearest neighbor — the third ANN
  * family beside sign-LSH and HNSW: a coarse quantizer assigns every
  * vector to its nearest centroid's cell; a query probes only the
  * `nProbe` nearest cells and exact-ranks the candidates.
  *
  * The v1 quantizer is DETERMINISTIC SAMPLING: the `nCells` vectors
  * with the lowest ids are the centroids. That keeps centroid choice
  * reproducible across Spark, driver-local Scala, and the DuckDB
  * oracle (a k-means refinement would drop into `centroids()` without
  * touching anything else — cell assignment and probing are
  * quantizer-agnostic).
  *
  * At 100 TB: [[cellAssignments]] is the persistable index — write it
  * partitioned by `cell` and a probe reads nProbe partitions instead of
  * the corpus. Assignment itself is one scan with nCells codegen'd
  * distance expressions; centroids ride along as broadcast literals.
  */
object IvfIndex {

  case class Params(nCells: Int = 16, nProbe: Int = 4)

  /** The nCells lowest-id vectors, in id order (deterministic). */
  def centroids(
      df: DataFrame,
      p: Params,
      idCol: String = "vec_id",
      embCol: String = "embedding"): IndexedSeq[Array[Float]] =
    df.select(col(idCol), col(embCol))
      // a NULL embedding in the lowest-id prefix would NPE the driver
      // mid-build with an opaque stack; the sample is a learned
      // parameter, so skipping invalid rows (deterministically — the
      // filter commutes with the id order) is strictly better than
      // crashing the whole createLibrary
      .where(col(embCol).isNotNull)
      .orderBy(col(idCol))
      .limit(p.nCells)
      .collect()
      .map(_.getSeq[Float](1).toArray)
      .toIndexedSeq

  /** The nearest-centroid cell as ONE shared column expression —
    * euclidean distances in centroid order, FIRST-minimum tie-break
    * (the oracle's `list_position(ds, list_min(ds))` semantics). Both
    * IVF assignment and the IVF-PQ codes writer derive their `cell`
    * from exactly this expression; two copies could drift and assign
    * the same vector to different cells across the two indexes. */
  private[operators] def nearestCellCol(
      cents: IndexedSeq[Array[Float]], embCol: String): Column = {
    val dists = array(cents.map(c =>
      VectorFunctions.euclidean(col(embCol), typedLit(c.toSeq))): _*)
    array_position(dists, array_min(dists)) - 1
  }

  /** Cell of every vector: index of the nearest centroid (euclidean),
    * ties resolved to the FIRST minimal centroid. */
  def cellAssignments(
      df: DataFrame,
      cents: IndexedSeq[Array[Float]],
      idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame =
    df.select(col(idCol), nearestCellCol(cents, embCol).as("cell"))

  /** The nProbe cells nearest to the query, by (dist, cell). */
  def probeCells(query: Seq[Float], cents: IndexedSeq[Array[Float]], nProbe: Int): Seq[Long] = {
    // loud on a mis-dimensioned query: the local kernel would read out
    // of bounds where the SQL-side distance path degrades to NULL
    require(cents.isEmpty || query.length == cents.head.length,
      s"query dim ${query.length} != centroid dim ${cents.headOption.map(_.length).getOrElse(0)}")
    val q = query.toArray
    cents.indices
      .map(i => (BatchKnn.distLocal(VectorFunctions.Euclidean, q, cents(i)), i.toLong))
      .sortBy(identity)
      .take(nProbe)
      .map(_._2)
  }

  /** The shared under-k fallback: semi-join the candidate ids into the
    * corpus, return the materialized candidates when they can fill k,
    * the full corpus otherwise. Counting AFTER the join is load-bearing
    * — candidate ids from a drifted index could exceed k while < k of
    * them exist in the corpus. */
  private[operators] def candidatesOrAll(
      df: DataFrame, candIds: DataFrame, k: Int, idCol: String): DataFrame = {
    val cands = df.join(candIds, Seq(idCol), "left_semi").localCheckpoint(true)
    if (cands.count() >= k) cands else df
  }

  /** Centroids as a persistable DataFrame (cid, embedding) — the small
    * side of the index. cid is the ordinal into [[centroids]]' order. */
  def centroidsDf(
      df: DataFrame,
      p: Params,
      idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame =
    centroidsDfFromVecs(df.sparkSession, centroids(df, p, idCol, embCol))

  /** Same, from already-collected centroid vectors (avoids a second
    * corpus scan when the caller holds them). */
  def centroidsDfFromVecs(
      spark: org.apache.spark.sql.SparkSession,
      cents: IndexedSeq[Array[Float]]): DataFrame = {
    import spark.implicits._
    cents.zipWithIndex.map { case (v, i) => (i, v.toSeq) }.toDF("cid", "embedding")
  }

  /** Centroid vectors back out of a persisted [[centroidsDf]] table. A
    * null vector here is CORRUPTION of a learned artifact, not data to
    * tolerate — name the problem instead of NPE'ing on `.toArray`. */
  def centroidsOf(centsDf: DataFrame): IndexedSeq[Array[Float]] =
    centsDf
      .orderBy("cid")
      .collect()
      .map { r =>
        val v = r.getSeq[Float](1)
        require(v != null, s"corrupt centroids table: null vector at cid=${r.get(0)}")
        v.toArray
      }
      .toIndexedSeq

  /** Cell assignments shaped for persistence: `cell` cast to int so the
    * column round-trips parquet partition discovery unchanged (discovery
    * infers IntegerType; a long column would come back retyped). Write
    * this `partitionBy("cell")` and a probe reads nProbe partition
    * directories instead of the corpus. */
  def assignmentsForWrite(
      df: DataFrame,
      cents: IndexedSeq[Array[Float]],
      idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame =
    cellAssignments(df, cents, idCol, embCol)
      .withColumn("cell", col("cell").cast("int"))

  /** Candidate base from a PREBUILT index (assignments + centroids
    * tables): probe the nProbe nearest cells — a partition-pruned read
    * when `assignments` comes from a cell-partitioned parquet table —
    * semi-join the ids, full-corpus fallback under k. No per-query
    * corpus re-assignment anywhere. */
  def candidateBase(
      df: DataFrame,
      assignments: DataFrame,
      centsDf: DataFrame,
      query: Seq[Float],
      k: Int,
      p: Params = Params(),
      idCol: String = "vec_id"): DataFrame =
    candidateBaseWithCents(
      df, assignments, centroidsOf(centsDf), query, k, p, idCol)

  /** [[candidateBase]] with the centroids ALREADY collected — the shape
    * a caller that serves many queries per index version wants (the
    * catalog memoizes the collect per (library, version); re-collecting
    * nList driver rows per search is a wasted job). */
  def candidateBaseWithCents(
      df: DataFrame,
      assignments: DataFrame,
      cents: IndexedSeq[Array[Float]],
      query: Seq[Float],
      k: Int,
      p: Params = Params(),
      idCol: String = "vec_id"): DataFrame = {
    val probed = probeCells(query, cents, p.nProbe).map(_.toInt)
    val candIds = assignments
      .where(col("cell").isin(probed: _*))
      .select(idCol)
    candidatesOrAll(df, candIds, k, idCol)
  }

  /** Probe a prebuilt index, then exact re-rank — the scale path. */
  def searchWithTable(
      df: DataFrame,
      assignments: DataFrame,
      centsDf: DataFrame,
      query: Seq[Float],
      k: Int,
      p: Params = Params(),
      metric: VectorFunctions.Metric = VectorFunctions.Euclidean,
      idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame =
    FlatKnn.search(
      candidateBase(df, assignments, centsDf, query, k, p, idCol),
      query, k, metric, idCol, embCol)

  /** Approximate top-k: probe cells, exact re-rank, full-scan fallback
    * when the probed cells hold fewer than k vectors. */
  def search(
      df: DataFrame,
      query: Seq[Float],
      k: Int,
      p: Params = Params(),
      metric: VectorFunctions.Metric = VectorFunctions.Euclidean,
      idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame = {
    val cents = centroids(df, p, idCol, embCol)
    val probed = probeCells(query, cents, p.nProbe)
    val base = candidatesOrAll(
      df,
      cellAssignments(df, cents, idCol, embCol)
        .where(col("cell").isin(probed: _*))
        .select(idCol),
      k, idCol)
    FlatKnn.search(base, query, k, metric, idCol, embCol)
  }
}
