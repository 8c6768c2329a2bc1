package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.GroupedTopK

/** GroupedTopK (custom LogicalPlan → Strategy → partial/final exec)
  * pinned against the window row_number formulation, plus the plan
  * properties it exists for: no Sort, no Window, exactly one exchange,
  * and the partial stage BELOW the exchange. */
class GroupedTopKSpec extends SparkSpec {

  import spark.implicits._

  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")

  private def windowed(k: Int, desc: Boolean) = {
    val o = if (desc) col("n_chars").desc else col("n_chars").asc
    docs.withColumn("__r", row_number().over(Window.partitionBy("lang").orderBy(o, col("doc_id"))))
      .where(col("__r") <= k).drop("__r")
      .select("lang", "doc_id", "n_chars")
  }

  test("NULL order values rank exactly like the window formulation (asc = nulls first, desc = nulls last)") {
    // a null order value must never silently compete as 0 — it follows
    // Spark's own sort-direction null placement, pinned against the
    // window twin on a fixture where nulls, negatives, and zero coexist
    val rows = Seq(
      ("a", 1L, java.lang.Long.valueOf(5L)), ("a", 2L, null),
      ("a", 3L, java.lang.Long.valueOf(-7L)), ("a", 4L, java.lang.Long.valueOf(0L)),
      ("b", 5L, null), ("b", 6L, null), ("b", 7L, java.lang.Long.valueOf(2L)))
      .toDF("g", "id", "v")
    for (desc <- Seq(false, true); k <- Seq(1, 2)) {
      val o = if (desc) col("v").desc else col("v").asc
      val expected = rows
        .withColumn("__r", row_number().over(
          Window.partitionBy("g").orderBy(o, col("id"))))
        .where(col("__r") <= k).drop("__r")
        .select("g", "id").as[(String, Long)].collect().toSet
      val fast = GroupedTopK
        .topKPerGroup(rows, Seq("g"), "v", k, desc, tieCol = "id")
        .select("g", "id").as[(String, Long)].collect().toSet
      assert(fast === expected, s"desc=$desc k=$k")
    }
  }

  test("matches the window row_number formulation, asc and desc") {
    for (desc <- Seq(true, false); k <- Seq(1, 3, 7)) {
      val fast = GroupedTopK
        .topKPerGroup(docs, Seq("lang"), "n_chars", k, desc, tieCol = "doc_id")
        .select("lang", "doc_id", "n_chars")
        .as[(String, Long, Long)].collect().toSet
      val expected = windowed(k, desc).as[(String, Long, Long)].collect().toSet
      assert(fast === expected, s"desc=$desc k=$k")
    }
  }

  test("result is partitioning-invariant (ties cut on the tie column)") {
    val base = GroupedTopK
      .topKPerGroup(docs, Seq("lang"), "n_chars", 5, descending = true, tieCol = "doc_id")
      .select("doc_id").as[Long].collect().toSet
    val repartitioned = GroupedTopK
      .topKPerGroup(docs.repartition(13, col("doc_id")), Seq("lang"), "n_chars", 5,
        descending = true, tieCol = "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(base === repartitioned)
  }

  test("plan: partial below ONE exchange, final above, no Sort/Window") {
    val plan = GroupedTopK
      .topKPerGroup(docs, Seq("lang"), "n_chars", 3, descending = true, tieCol = "doc_id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("GroupedTopKPartial"), plan)
    assert(plan.contains("GroupedTopKFinal"), plan)
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("Sort "), plan)
    assert("Exchange hashpartitioning".r.findAllIn(plan).length === 1, plan)
    // partial must sit below the exchange: its survivors are what shuffles
    val partialIdx = plan.indexOf("GroupedTopKPartial")
    val exchangeIdx = plan.indexOf("Exchange hashpartitioning")
    val finalIdx = plan.indexOf("GroupedTopKFinal")
    assert(finalIdx < exchangeIdx && exchangeIdx < partialIdx,
      s"want Final above Exchange above Partial:\n$plan")
  }

  test("groups smaller than k pass through whole") {
    val out = GroupedTopK
      .topKPerGroup(docs.where(col("doc_id") < 3), Seq("lang"), "n_chars", 100,
        descending = false, tieCol = "doc_id")
      .count()
    assert(out === 3)
  }

  test("retention contract is enforced: too many keys per task fails loudly, not OOM") {
    // every doc_id its own group in one task, with a ceiling far below
    // the key count: the partial stage must refuse with the remediation
    // message instead of accumulating unboundedly
    val ex = intercept[org.apache.spark.SparkException] {
      GroupedTopK
        .topKPerGroup(docs.coalesce(1), Seq("doc_id"), "n_chars", 2,
          descending = false, tieCol = "doc_id", maxRetained = 64)
        .count()
    }
    val msg = ex.getCause match { case null => ex.getMessage; case c => c.getMessage }
    assert(msg.contains("pre-partition"), s"unexpected error: $msg")
    // a deliberate raise clears it
    val n = GroupedTopK
      .topKPerGroup(docs.coalesce(1), Seq("doc_id"), "n_chars", 2,
        descending = false, tieCol = "doc_id",
        maxRetained = 1 << 22)
      .count()
    assert(n === docs.count())
  }
}
