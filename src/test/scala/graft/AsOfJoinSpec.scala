package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin

/** AsOfJoin semantics on a hand-computable fixture plus a
  * naive-formulation equivalence on real events data. The plan shape
  * matters as much as the values: ONE shuffle (the window's key
  * partitioning), never a pair-materializing range join. */
class AsOfJoinSpec extends SparkSpec {

  import spark.implicits._

  private def leftDf = Seq(
    // (key, ts, label)
    ("a", 10L, "a10"), ("a", 20L, "a20"), ("a", 30L, "a30"),
    ("b", 5L, "b5"), ("c", 7L, "c7")
  ).toDF("k", "t", "label").withColumn("t", timestamp_micros(col("t")))

  private def rightDf = Seq(
    ("a", 10L, 1.0), ("a", 25L, 2.0),
    ("b", 6L, 3.0), ("d", 1L, 4.0)
  ).toDF("k", "t", "v").withColumn("t", timestamp_micros(col("t")))

  test("backward as-of: latest right at-or-before, inclusive at equality") {
    val out = AsOfJoin
      .asOfBackward(leftDf, rightDf, Seq("k"), "t", "t", Seq("t", "v"))
      .select(col("label"), unix_micros(col("asof_t")).as("mt"), col("asof_v"))
      .collect()
      .map(r => r.getString(0) -> ((Option(r.get(1)), Option(r.get(2)))))
      .toMap

    assert(out("a10") === ((Some(10L), Some(1.0)))) // equal ts matches (>= semantics)
    assert(out("a20") === ((Some(10L), Some(1.0)))) // 25 is later, not eligible
    assert(out("a30") === ((Some(25L), Some(2.0)))) // most recent of {10, 25}
    assert(out("b5") === ((None, None)))            // right row is after the left ts
    assert(out("c7") === ((None, None)))            // no right rows for key at all
  }

  test("forward as-of: earliest right at-or-after") {
    val out = AsOfJoin
      .asOfForward(leftDf, rightDf, Seq("k"), "t", "t", Seq("t", "v"))
      .select(col("label"), unix_micros(col("asof_t")).as("mt"))
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(out("a10") === Some(10L)) // inclusive
    assert(out("a20") === Some(25L))
    assert(out("a30") === None)      // nothing after 30
    assert(out("b5") === Some(6L))
  }

  test("NULL timestamps never match (ASOF comparison semantics), left null-ts rows surface with NULL") {
    // a null-ts RIGHT row must never be "the most recent at-or-before"
    // anything (it previously sorted NULLS FIRST and leaked its payload
    // into every matchless left row); a null-ts LEFT row stays in the
    // output — it is a LEFT join — with a NULL match in BOTH directions
    val l = Seq(("a", Some(20L), "a20"), ("a", None, "aN"), ("c", Some(7L), "c7"))
      .toDF("k", "t0", "label")
      .withColumn("t", timestamp_micros(col("t0"))).drop("t0")
    val r = Seq(("a", Some(10L), 1.0), ("a", None, 99.0), ("c", None, 98.0))
      .toDF("k", "t0", "v")
      .withColumn("t", timestamp_micros(col("t0"))).drop("t0")
    val back = AsOfJoin.asOfBackward(l, r, Seq("k"), "t", "t", Seq("v"))
      .collect().map(x => x.getAs[String]("label") -> Option(x.get(x.fieldIndex("asof_v")))).toMap
    assert(back("a20") === Some(1.0)) // the real row, not the null-ts 99.0
    assert(back("aN") === None, "null-ts left row must get a NULL match")
    assert(back("c7") === None, "null-ts right row leaked its payload")
    val fwd = AsOfJoin.asOfForward(l, r, Seq("k"), "t", "t", Seq("v"))
      .collect().map(x => x.getAs[String]("label") -> Option(x.get(x.fieldIndex("asof_v")))).toMap
    assert(fwd("aN") === None,
      "null-ts left row wrongly picked up a 'next event' in forward mode")
    assert(fwd("c7") === None)
  }

  test("matches the naive quadratic formulation on real events") {
    val ev = SparkEntry.events(spark, sfDir)
    val p = ev.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val c = ev.where(col("event_type") === "click")
      .groupBy("user_id", "ts").agg(max("value").as("v"))
    val fast = AsOfJoin.asOfBackward(p, c, Seq("user_id"), "ts", "ts", Seq("ts", "v"))
      .select(col("event_id"), unix_micros(col("asof_ts")).as("mt"), col("asof_v"))
    // naive: all (purchase, earlier-click) pairs, keep the max click ts
    val naive = p.as("p")
      .join(c.as("c"),
        col("p.user_id") === col("c.user_id") && col("p.ts") >= col("c.ts"),
        "left_outer")
      .groupBy(col("p.event_id").as("event_id"))
      .agg(
        max(struct(unix_micros(col("c.ts")).as("mt"), col("c.v").as("v"))).as("m"))
      .select(col("event_id"), col("m.mt").as("mt"), col("m.v").as("asof_v"))
    val mismatches = fast.as("f")
      .join(naive.as("n"), Seq("event_id"), "full_outer")
      .where(
        !(col("f.mt") <=> col("n.mt")) || !(col("f.asof_v") <=> col("n.asof_v")))
      .count()
    assert(mismatches === 0L)
  }

  test("plan has exactly one exchange and no join of the two sides") {
    val out = AsOfJoin
      .asOfBackward(leftDf, rightDf, Seq("k"), "t", "t", Seq("v"))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of must not plan a join:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges === 1, s"want exactly one shuffle, got $exchanges:\n$plan")
  }
}
