package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join via bucket expansion — the scale-safe
  * shape for `points JOIN intervals ON pt BETWEEN start AND end`.
  *
  * Spark plans a pure range predicate as BroadcastNestedLoopJoin (or a
  * cartesian product when neither side broadcasts): every point is
  * tested against every interval, O(|points|·|intervals|) — unusable
  * when both sides are large. The published fix (Databricks' range-join
  * binning, Sedona's partitioned spatial joins) maps both sides onto
  * fixed-width buckets of the join dimension: an interval replicates to
  * every bucket it overlaps, a point lands in exactly one, and the join
  * becomes a hash EQUI-join on the bucket id with the exact `BETWEEN`
  * kept as a post-filter. Shuffle cost is O(points + intervals ·
  * avg_buckets_per_interval); no pair blowup ever materializes.
  *
  * Bucket mapping uses truncating integer division, which is monotone,
  * so `start <= pt <= end` implies `bucket(start) <= bucket(pt) <=
  * bucket(end)` — the exploded bucket range always contains the point's
  * bucket (no false negatives, including for negative coordinates), and
  * the exact post-filter removes the false positives.
  *
  * Pick `bucketWidth` near the typical interval length: much smaller
  * explodes intervals into many replicas, much larger piles unrelated
  * points into each bucket before the post-filter. Intervals vastly
  * longer than `bucketWidth` (a "whole-corpus" interval) should go
  * through [[pointInIntervalBroadcast]] instead — replicating one
  * giant interval to millions of buckets is the one way to abuse this
  * shape; `maxBucketsPerInterval` fails fast at plan-author time.
  *
  * Both sides' column sets must be disjoint (pre-project/rename).
  */
object RangeJoin {

  /** Bucketed equi-join path. `keys` are optional extra equi-join
    * columns (present under the same names on both sides).
    *
    * @param points      left side; all columns pass through
    * @param ptCol       integer point column (e.g. epoch micros)
    * @param intervals   right side; all columns pass through
    * @param startCol    inclusive interval start (same units as ptCol)
    * @param endCol      inclusive interval end
    * @param bucketWidth bucket width in ptCol units, > 0
    */
  def pointInInterval(
      points: DataFrame,
      ptCol: String,
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      bucketWidth: Long,
      keys: Seq[String] = Nil,
      maxBucketsPerInterval: Int = 4096): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val ivals = intervals
      .withColumn("__b0", expr(s"`$startCol` DIV ${bucketWidth}L"))
      .withColumn("__b1", expr(s"`$endCol` DIV ${bucketWidth}L"))
      // fail fast instead of silently materializing a replica storm —
      // raise_error is codegen'd and costs nothing on the good path.
      // INVERTED intervals (end < start) must short-circuit to an empty
      // bucket array, not reach sequence(): the span check is trivially
      // true for a negative span, and sequence(b0, b1) with b0 > b1
      // generates a DESCENDING array — a malformed (1e9, 0) interval
      // would materialize a gigarow array per row, the exact storm the
      // guard exists for. BETWEEN is unsatisfiable for them anyway, so
      // dropping matches the exact predicate.
      .withColumn("__bucket", explode(
        when(col("__b1") < col("__b0"),
          array().cast("array<bigint>"))
          .when(col("__b1") - col("__b0") < lit(maxBucketsPerInterval.toLong),
            sequence(col("__b0"), col("__b1")))
          .otherwise(raise_error(concat(
            lit(s"RangeJoin: interval spans >= $maxBucketsPerInterval buckets of width $bucketWidth; "),
            lit("widen bucketWidth or route it through pointInIntervalBroadcast"))))))
      .drop("__b0", "__b1")
    points
      .withColumn("__bucket", expr(s"`$ptCol` DIV ${bucketWidth}L"))
      .join(ivals, keys :+ "__bucket", "inner")
      .where(col(ptCol) >= col(startCol) && col(ptCol) <= col(endCol))
      .drop("__bucket")
  }

  /** Escape hatch for a SMALL interval side (dims, campaign windows,
    * corpus-spanning intervals): broadcast it and keep the pure range
    * predicate. The plan is BroadcastNestedLoopJoin by construction —
    * correct only because the broadcast side is tiny. */
  def pointInIntervalBroadcast(
      points: DataFrame,
      ptCol: String,
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      keys: Seq[String] = Nil): DataFrame = {
    val b = broadcast(intervals)
    val cond = (keys.map(k => points(k) === b(k)) :+
      (points(ptCol) >= b(startCol)) :+
      (points(ptCol) <= b(endCol))).reduce(_ && _)
    keys.foldLeft(points.join(b, cond, "inner"))((d, k) => d.drop(b(k)))
  }
}
