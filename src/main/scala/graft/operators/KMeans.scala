package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed k-means (Lloyd) over a GLOBALLY quantized embedding
  * space — the semantic-clustering primitive of training-data curation
  * (cluster-then-dedup / cluster-balanced sampling; the reference has
  * no clustering, this is the beyond-parity analytics layer over its
  * embedding model, `app/core/models/chunk.py` embeddings).
  *
  * Everything is integer-exact, which buys two things at once:
  *  - determinism: int64 distances and half-up-rounded integer centroid
  *    means are bit-identical under ANY partitioning (float k-means is
  *    not: partial-sum order drifts the centroids), so results are
  *    reproducible cluster-to-cluster and oracle-checkable;
  *  - scale: each Lloyd round is one aggregation with map-side combine —
  *    K×(dim+1) partial sums per partition cross the exchange, the
  *    corpus itself NEVER shuffles. Centroids ride into the executors
  *    as plan literals (broadcast by construction, K·dim longs).
  *
  * The uniform scale (one global factor, not per-vector) preserves the
  * geometry — per-vector quantization scales (the `q_quantize_embed`
  * storage form) would distort inter-vector distances.
  */
object KMeans {

  /** Global quantization factor: ~3 decimal digits of the unit-scale
    * embedding coordinates. */
  val Scale = 1000.0

  /** `array<float>` → `array<long>`: half-up rounding of `v * Scale`
    * (explicit `floor(x + 0.5)` — no engine round-mode divergence, the
    * `q_quantize_embed` discipline). */
  def quantize(vec: Column): Column =
    transform(vec, v => floor(v.cast("double") * lit(Scale) + lit(0.5)).cast("long"))

  /** Exact int64 squared euclidean distance to one centroid literal. */
  def distTo(x: Column, centroid: Seq[Long]): Column =
    aggregate(
      zip_with(x, typedLit(centroid), (a, b) => (a - b) * (a - b)),
      lit(0L),
      (acc, v) => acc + v)

  /** Lloyd assignment: nearest centroid id (ties → lowest id, matching
    * the oracle's `ORDER BY dist, cid` tie-break) plus the exact
    * squared distance. The fused [[graft.functions.KMeansAssign]]
    * kernel — one codegen'd loop per row, centroid matrix as a
    * reference object; the `__r` intermediate is referenced twice so
    * CollapseProject keeps the projection boundary and the kernel runs
    * once per row (the TermCounts discipline). Pure per-row
    * expressions — no join, no shuffle. */
  def assign(df: DataFrame, xCol: String, centroids: Seq[Seq[Long]]): DataFrame = {
    require(centroids.nonEmpty, "assign needs at least one centroid")
    import org.apache.spark.sql.graft.ColumnBridge
    val r = ColumnBridge.column(graft.functions.KMeansAssign(
      ColumnBridge.expression(col(xCol)),
      centroids.map(_.toArray).toArray))
    df.withColumn("__r", r)
      .withColumn("cid", element_at(col("__r"), 1).cast("int"))
      .withColumn("dist", element_at(col("__r"), 2))
      .drop("__r")
  }

  /** Composed-builtin twin of [[assign]] (K zip_with+aggregate dist
    * columns, array_min + first-match array_position) — kept as the
    * bitwise ground truth the fused kernel is pinned against. */
  def assignComposed(df: DataFrame, xCol: String, centroids: Seq[Seq[Long]]): DataFrame = {
    require(centroids.nonEmpty, "assign needs at least one centroid")
    val dists = array(centroids.map(c => distTo(col(xCol), c)): _*)
    df.withColumn("__d", dists)
      .withColumn("dist", array_min(col("__d")))
      .withColumn("cid", (array_position(col("__d"), col("dist")) - 1).cast("int"))
      .drop("__d")
  }

  /** Centroid update: ONE aggregation (dim sums + a count per cluster,
    * map-side combined), K rows to the driver. The new component is the
    * half-up rounded integer mean `floor((2·s + n) / (2·n))` — the
    * exact-integer-in-double form both engines compute identically. An
    * empty cluster keeps its previous centroid. */
  def recenter(
      assigned: DataFrame,
      xCol: String,
      prev: Seq[Seq[Long]]): Seq[Seq[Long]] = {
    val dim = prev.head.size
    val aggs = (0 until dim).map(d =>
      sum(element_at(col(xCol), d + 1)).as(s"__s$d")) :+ count(lit(1)).as("__n")
    // wrong-dimension rows assign NULL (see KMeansAssign) — they must
    // not form a null-cid group here, they just don't vote
    val rows = assigned.where(col("cid").isNotNull)
      .groupBy("cid").agg(aggs.head, aggs.tail: _*).collect()
    val byCid = rows.map(r => r.getInt(0) -> r).toMap
    prev.indices.map { cid =>
      byCid.get(cid) match {
        case Some(r) =>
          val n = r.getLong(dim + 1)
          (0 until dim).map { d =>
            math.floor((2.0 * r.getLong(d + 1) + n) / (2.0 * n)).toLong
          }
        case None => prev(cid)
      }
    }
  }

  /** `iters` Lloyd rounds from `init`; returns the final centroids.
    * (Callers typically follow with one more [[assign]] to read out the
    * final clustering.) */
  def fit(
      df: DataFrame,
      xCol: String,
      init: Seq[Seq[Long]],
      iters: Int): Seq[Seq[Long]] =
    (0 until iters).foldLeft[Seq[Seq[Long]]](init) { (c, _) =>
      recenter(assign(df, xCol, c), xCol, c)
    }
}
