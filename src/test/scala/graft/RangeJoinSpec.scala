package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

/** RangeJoin semantics (boundary inclusivity, multi-bucket spans,
  * negative coordinates, extra equi-keys) pinned against the naive
  * BETWEEN formulation, plus the plan claim that makes the operator
  * worth having: the bucketed path joins with a hash/merge EQUI-join,
  * never a nested-loop or cartesian pair blowup. */
class RangeJoinSpec extends SparkSpec {

  import spark.implicits._

  // points at every integer in [-25, 75); intervals of assorted widths
  // (sub-bucket, exact-bucket, multi-bucket, negative, empty-match)
  private def points: DataFrame =
    spark.range(-25, 75).select(col("id").as("pt"), (col("id") % 7).as("tag"))

  private def intervals: DataFrame = Seq(
    (1L, -20L, -10L), // negative coords, multi-bucket at width 8
    (2L, -3L, 4L),    // straddles zero
    (3L, 10L, 10L),   // single point
    (4L, 16L, 47L),   // spans 4+ buckets at width 8
    (5L, 60L, 74L),
    (6L, 200L, 300L)  // matches nothing
  ).toDF("ival_id", "lo", "hi")

  private def naive: Set[(Long, Long)] =
    points.join(intervals, col("pt") >= col("lo") && col("pt") <= col("hi"))
      .select("pt", "ival_id").as[(Long, Long)].collect().toSet

  test("bucketed join == naive BETWEEN join, boundaries inclusive") {
    for (w <- Seq(1L, 3L, 8L, 100L)) {
      val fast = RangeJoin
        .pointInInterval(points, "pt", intervals, "lo", "hi", bucketWidth = w)
        .select("pt", "ival_id").as[(Long, Long)].collect()
      assert(fast.length === fast.toSet.size, s"duplicate pairs at width $w")
      assert(fast.toSet === naive, s"mismatch at bucket width $w")
    }
  }

  test("extra equi-keys restrict matches") {
    val p = points
    val keyed = intervals.withColumn("tag", col("ival_id") % 7)
    val fast = RangeJoin
      .pointInInterval(p, "pt", keyed.drop("ival_id"), "lo", "hi",
        bucketWidth = 8L, keys = Seq("tag"))
      .select("pt", "lo").as[(Long, Long)].collect().toSet
    val expected = p
      .join(keyed, p("tag") === keyed("tag") &&
        col("pt") >= col("lo") && col("pt") <= col("hi"))
      .select("pt", "lo").as[(Long, Long)].collect().toSet
    assert(fast === expected)
  }

  test("broadcast escape hatch matches naive too") {
    val out = RangeJoin
      .pointInIntervalBroadcast(points, "pt", intervals, "lo", "hi")
      .select("pt", "ival_id").as[(Long, Long)].collect().toSet
    assert(out === naive)
  }

  test("plan: equi-join on the bucket id, no nested loop / cartesian") {
    // forbid broadcast so the plan is the large-large shape under test
    val noBroadcast = points.hint("merge")
    val plan = RangeJoin
      .pointInInterval(noBroadcast, "pt", intervals, "lo", "hi", bucketWidth = 8L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
  }

  test("an INVERTED interval (end < start) drops instead of materializing a descending bucket storm") {
    // its negative span trivially passes the `< maxBuckets` guard, and
    // sequence(b0, b1) with b0 > b1 is a DESCENDING array — a malformed
    // (1e9, 0) interval would materialize a gigarow array per row;
    // BETWEEN is unsatisfiable for it, so the row must simply drop
    val inverted = Seq((1L, 1000000000L, 0L), (2L, 10L, 20L))
      .toDF("ival_id", "lo", "hi")
    val out = RangeJoin
      .pointInInterval(points, "pt", inverted, "lo", "hi", bucketWidth = 8L)
      .select("ival_id").distinct().as[Long].collect().toSet
    assert(out === Set(2L), s"inverted interval produced matches: $out")
  }

  test("a bucket-storm interval fails fast instead of exploding") {
    val giant = Seq((1L, 0L, Long.MaxValue / 2)).toDF("ival_id", "lo", "hi")
    val e = intercept[Exception] {
      RangeJoin.pointInInterval(points, "pt", giant, "lo", "hi", bucketWidth = 8L)
        .collect()
    }
    val messages = Iterator.iterate[Throwable](e)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse("")).toSeq
    assert(messages.exists(_.contains("RangeJoin")), messages.mkString(" | "))
  }
}
