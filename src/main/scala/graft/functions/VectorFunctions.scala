package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Distance metrics of the reference engine, re-expressed as Catalyst
  * column builders over `ARRAY<FLOAT>` columns.
  *
  * Reference semantics: `/root/reference/app/core/indexers/indexer.py:89-130`
  * (euclidean 106-108, cosine incl. zero-magnitude guard 110-122,
  * negative dot product 124-126, manhattan 128-130).
  *
  * All arithmetic is done in `double` regardless of the input element type
  * (the reference computes in float32; we accumulate in double for
  * cross-engine oracle stability — see SURVEY.md §7.4.3). Every builder
  * composes only codegen'd built-ins (`zip_with`, `aggregate`, `transform`),
  * so the whole distance computation stays inside whole-stage codegen with
  * no UDF/serialization boundary.
  */
object VectorFunctions {

  /** Supported distance metrics (reference: indexer.py:21-25). */
  sealed trait Metric { def name: String }
  case object Euclidean extends Metric { val name = "euclidean" }
  case object Cosine extends Metric { val name = "cosine" }
  case object DotProduct extends Metric { val name = "dot_product" }
  case object Manhattan extends Metric { val name = "manhattan" }

  object Metric {
    val all: Seq[Metric] = Seq(Euclidean, Cosine, DotProduct, Manhattan)
    def fromString(s: String): Metric = all
      .find(_.name == s.toLowerCase)
      .getOrElse(throw new IllegalArgumentException(s"unknown metric: $s"))
  }

  private def d(c: Column): Column = c.cast("double")

  /** Sequential left-to-right double-accumulated sum over an array column. */
  private def arraySum(arr: Column): Column =
    aggregate(arr, lit(0.0), (acc, x) => acc + x)

  /** dot(a, b) accumulated in double. */
  def dotProduct(a: Column, b: Column): Column =
    arraySum(zip_with(a, b, (x, y) => d(x) * d(y)))

  /** L2 norm of a vector. */
  def l2Norm(a: Column): Column =
    sqrt(arraySum(transform(a, x => d(x) * d(x))))

  /** L2-normalized copy of the vector (HNSW ingest semantics,
    * reference hnsw.py:116,300). Zero vectors pass through unchanged.
    * NOTE: the bound `n` is referenced inside the transform lambda, so
    * the O(dim) norm aggregate re-evaluates per ELEMENT and the
    * higher-order functions run interpreted — fine for a one-off
    * column, pathological on a hot scan. Scans over float vectors
    * should use [[l2NormalizeFloat]] (fused, codegen'd,
    * bit-identical on ARRAY<FLOAT> modulo its float output rounding). */
  def l2Normalize(a: Column): Column = {
    val n = l2Norm(a)
    when(n === 0.0, a).otherwise(transform(a, x => d(x) / n))
  }

  /** Fused float L2-normalization of an ARRAY<FLOAT> column — the
    * [[L2NormalizeFloat]] expression: one norm pass + one scale pass
    * per row inside whole-stage codegen (see its scaladoc for the
    * measured O(dim²)-interpreted hazard of the composed form). */
  def l2NormalizeFloat(a: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(L2NormalizeFloat(ColumnBridge.expression(a)))
  }

  /** Euclidean (L2) distance. */
  def euclidean(a: Column, b: Column): Column =
    sqrt(arraySum(zip_with(a, b, (x, y) => (d(x) - d(y)) * (d(x) - d(y)))))

  /** Manhattan (L1) distance. */
  def manhattan(a: Column, b: Column): Column =
    arraySum(zip_with(a, b, (x, y) => abs(d(x) - d(y))))

  /** Cosine distance = 1 - cos_sim, with the reference's zero-magnitude
    * guard (either norm 0 => distance 1.0; indexer.py:117-119). */
  def cosineDistance(a: Column, b: Column): Column = {
    val na = l2Norm(a)
    val nb = l2Norm(b)
    when(na === 0.0 || nb === 0.0, lit(1.0))
      .otherwise(lit(1.0) - dotProduct(a, b) / (na * nb))
  }

  /** Negative dot product ("smaller is closer", indexer.py:124-126). */
  def negDotProduct(a: Column, b: Column): Column = -dotProduct(a, b)

  /** Runtime-dispatched distance, mirroring Indexer._calculate_distance.
    * Uses the fused codegen [[VectorDistance]] expression (one loop, no
    * intermediate arrays) — bit-identical to [[builtinDistance]], which
    * remains the reference implementation the equivalence spec checks
    * against. */
  def distance(a: Column, b: Column, metric: Metric): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(
      VectorDistance(
        ColumnBridge.expression(a),
        ColumnBridge.expression(b),
        metric.name))
  }

  /** v0 built-in composition form (zip_with/aggregate) — kept as the
    * independently-written mirror for VectorDistanceSpec's bitwise
    * equivalence check. */
  def builtinDistance(a: Column, b: Column, metric: Metric): Column = metric match {
    case Euclidean  => euclidean(a, b)
    case Cosine     => cosineDistance(a, b)
    case DotProduct => negDotProduct(a, b)
    case Manhattan  => manhattan(a, b)
  }

  /** Cosine similarity (for near-dup / ANN scoring paths) — the fused
    * codegen kernel (`cosine_sim` mode of [[VectorDistance]]): one loop,
    * guard -> 0.0, bitwise-equal to [[cosineSimilarityComposed]]
    * (asserted in VectorDistanceSpec). */
  def cosineSimilarity(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(
      VectorDistance(
        ColumnBridge.expression(a),
        ColumnBridge.expression(b),
        "cosine_sim"))
  }

  /** Built-in-composition twin of [[cosineSimilarity]] (zip_with +
    * aggregate) — the independently-written mirror the bitwise
    * equivalence spec checks the fused kernel against. */
  def cosineSimilarityComposed(a: Column, b: Column): Column = {
    val na = l2Norm(a)
    val nb = l2Norm(b)
    when(na === 0.0 || nb === 0.0, lit(0.0))
      .otherwise(dotProduct(a, b) / (na * nb))
  }
}
