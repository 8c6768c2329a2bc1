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
      .orderBy(col(idCol))
      .limit(p.nCells)
      .collect()
      .map(_.getSeq[Float](1).toArray)
      .toIndexedSeq

  /** Cell of every vector: index of the nearest centroid (euclidean),
    * ties resolved to the FIRST minimal centroid — the same semantics
    * as `list_position(ds, list_min(ds))` in the oracle. */
  def cellAssignments(
      df: DataFrame,
      cents: IndexedSeq[Array[Float]],
      idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame = {
    val dists = array(cents.map(c =>
      VectorFunctions.euclidean(col(embCol), typedLit(c.toSeq))): _*)
    df.select(col(idCol), dists.as("__ds"))
      .select(
        col(idCol),
        (array_position(col("__ds"), array_min(col("__ds"))) - 1).as("cell"))
  }

  /** Driver-local euclidean — same op order as the column builder. */
  private def distLocal(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) {
      val d = a(i).toDouble - b(i)
      s += d * d
      i += 1
    }
    math.sqrt(s)
  }

  /** The nProbe cells nearest to the query, by (dist, cell). */
  def probeCells(query: Seq[Float], cents: IndexedSeq[Array[Float]], nProbe: Int): Seq[Long] =
    cents.indices
      .map(i => (distLocal(query.toArray, cents(i)), i.toLong))
      .sortBy(identity)
      .take(nProbe)
      .map(_._2)

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

  /** Centroid vectors back out of a persisted [[centroidsDf]] table. */
  def centroidsOf(centsDf: DataFrame): IndexedSeq[Array[Float]] =
    centsDf
      .orderBy("cid")
      .collect()
      .map(_.getSeq[Float](1).toArray)
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
      idCol: String = "vec_id"): DataFrame = {
    val cents = centroidsOf(centsDf)
    val probed = probeCells(query, cents, p.nProbe).map(_.toInt)
    val candIds = assignments
      .where(col("cell").isin(probed: _*))
      .select(idCol)
    val cands = df.join(candIds, Seq(idCol), "left_semi").localCheckpoint(true)
    if (cands.count() >= k) cands else df
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
    val cand = df
      .join(
        cellAssignments(df, cents, idCol, embCol)
          .where(col("cell").isin(probed: _*))
          .select(idCol),
        Seq(idCol),
        "left_semi")
      .localCheckpoint(true)
    val base = if (cand.count() >= k) cand else df
    FlatKnn.search(base, query, k, metric, idCol, embCol)
  }
}
