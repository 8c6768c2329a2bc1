package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering + zone-map data skipping — the
  * multi-dimensional layout story for a 100 TB fact table.
  *
  * A single-column partition layout prunes one predicate dimension; a
  * 2-D range query (user × time, the canonical events shape) over it
  * still scans every partition of the other dimension. Interleaving the
  * bits of both scaled keys puts rows close in BOTH dimensions into the
  * same bucket, so per-bucket min/max "zones" are tight rectangles and
  * a 2-D range query selects only the buckets whose rectangle overlaps
  * it — the Delta/Iceberg OPTIMIZE ZORDER + data-skipping design,
  * expressed here as: Morton bucket as a parquet partition column
  * (partition pruning = file skipping), rows z-sorted WITHIN each
  * bucket (tight parquet row-group stats for the pushed residual
  * filter), and a bounded zones table consulted on the driver (64 rows
  * here; per-file stats in a real lakehouse manifest).
  *
  * Everything is integer arithmetic: scaling is a subtraction + literal
  * right-shift (monotone, no division), the Morton code is shift/mask
  * composition — deterministic under any partitioning, and the pruned
  * read's RESULT is pinned by a DuckDB oracle that never sees the
  * layout (a zone bug would drop rows and fail the hash, so the oracle
  * checks skipping CORRECTNESS, not just the aggregate).
  */
object ZOrder {

  /** Morton-interleave the low 16 bits of `x` (even bit positions) and
    * `y` (odd): a 32-bit z-value as a non-negative long. Pure literal
    * shift/mask composition — stays inside whole-stage codegen. */
  def zValue16(x: Column, y: Column): Column =
    (0 until 16)
      .map { i =>
        shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i)
          .bitwiseOR(
            shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
      }
      .reduce(_ bitwiseOR _)

  /** Driver-local twin of [[zValue16]] (spec-pinned equal). */
  def zValue16Local(x: Long, y: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 16) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  /** Literal shift that maps `[0, span]` monotonically ONTO 16 bits —
    * subtraction + shift, no division, exact at any magnitude (an
    * integer-scaled `* 65535 / span` overflows at 2^47 spans and a
    * double-rounded one drifts above 2^52). Positive = right-shift
    * (wide spans compress), negative = left-shift (narrow spans
    * STRETCH so their top bits still spread the bucket grid — a 0..14
    * user-id span must land in 8 distinct top-3-bit cells, not one). */
  def shiftFor(span: Long): Int = {
    require(span >= 0, s"negative span $span")
    64 - java.lang.Long.numberOfLeadingZeros(span) - 16
  }

  /** `(c - lo)` shifted by [[shiftFor]]`(hi - lo)`: the 16-bit scaled
    * key, always in `[0, 65535]`. */
  def scale16(c: Column, lo: Long, hi: Long): Column = {
    val sh = shiftFor(hi - lo)
    val d = c - lit(lo)
    if (sh > 0) shiftright(d, sh)
    else if (sh < 0) shiftleft(d, -sh)
    else d
  }

  def scale16Local(v: Long, lo: Long, hi: Long): Long = {
    val sh = shiftFor(hi - lo)
    if (sh > 0) (v - lo) >> sh else (v - lo) << -sh
  }

  /** Bucket = top `bits` bits of the interleaved z-value: 2^(2*bits)
    * buckets forming a 2^bits × 2^bits grid over the key space. ONE
    * definition — [[writeLayout]] derives its partition column through
    * this same helper, so the bucket formula cannot drift between the
    * documented grid and the written layout. */
  def zBucketOf(zvalue: Column, bits: Int): Column =
    shiftright(zvalue, 32 - 2 * bits)

  def zBucket(x: Column, y: Column, bits: Int): Column =
    zBucketOf(zValue16(x, y), bits)

  /** Inclusive zone rectangle per bucket, derived from the DATA (so the
    * zones are correct by construction, never from the bucket formula):
    * one tiny groupBy over the written layout. */
  def zones(layout: DataFrame, xCol: String, yCol: String): DataFrame =
    layout
      .groupBy("zbucket")
      .agg(
        min(xCol).as("x_min"), max(xCol).as("x_max"),
        min(yCol).as("y_min"), max(yCol).as("y_max"))

  /** Write `df` z-clustered on (`xCol`, `yCol`): Morton bucket as the
    * partition directory, rows z-sorted within each bucket so the
    * residual pushed filters also skip row groups via parquet min/max
    * stats. Bounds are passed in (one bounded agg at the caller). */
  def writeLayout(
      df: DataFrame,
      xCol: String,
      yCol: String,
      xLo: Long, xHi: Long,
      yLo: Long, yHi: Long,
      out: String,
      bits: Int = 3): Unit = {
    // the z-value is a WORKING column: it drives the partition bucket
    // and the within-bucket sort, then drops before the write — at the
    // layouts this targets, persisting 8 dead bytes per row is real
    // storage and scan width. A __-prefixed temp name also means a user
    // column called zvalue is never silently clobbered (zbucket IS
    // persisted as the partition dir, so that name stays reserved —
    // checked loudly).
    require(!df.columns.contains("zbucket"),
      "ZOrder.writeLayout: input already has a 'zbucket' column — rename it")
    val xb = scale16(col(xCol), xLo, xHi)
    val yb = scale16(col(yCol), yLo, yHi)
    df.withColumn("__zvalue", zValue16(xb, yb))
      .withColumn("zbucket", zBucketOf(col("__zvalue"), bits))
      .repartition(col("zbucket"))
      .sortWithinPartitions("zbucket", "__zvalue")
      .drop("__zvalue")
      .write
      .partitionBy("zbucket")
      .mode("overwrite")
      .parquet(out)
  }

  /** Buckets whose zone rectangle overlaps the query rectangle —
    * consulted from the COLLECTED zones table (bounded: 2^(2*bits)
    * rows). Inclusive ranges. */
  def overlappingBuckets(
      zoneRows: Seq[(Long, Long, Long, Long, Long)],
      xLo: Long, xHi: Long,
      yLo: Long, yHi: Long): Seq[Long] =
    zoneRows.collect {
      case (b, xMin, xMax, yMin, yMax)
          if xMax >= xLo && xMin <= xHi && yMax >= yLo && yMin <= yHi =>
        b
    }
}
