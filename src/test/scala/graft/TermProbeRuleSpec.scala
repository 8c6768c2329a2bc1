package graft

import org.apache.spark.sql.functions._

import graft.operators.InvertedIndex
import graft.plans.TermProbeRule

/** TermProbeRule pinned four ways: the rewrite actually fires (LeftSemi
  * against bucket-pruned postings, non-term conjunct surviving as a
  * Filter), it is row-invisible vs the scan form, it stays off without
  * the conf, and it respects the index's tokenizer discipline. */
class TermProbeRuleSpec extends SparkSpec {

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")

  private lazy val idxPath = {
    val p = java.nio.file.Files
      .createTempDirectory("termprobe_spec").toString + "/postings"
    InvertedIndex.build(docs.select("doc_id", "text"), p)
    p
  }

  private def withRule[T](body: => T): T = {
    if (!spark.experimental.extraOptimizations.contains(TermProbeRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ TermProbeRule
    spark.conf.set(TermProbeRule.ConfKey, "true")
    spark.conf.set(TermProbeRule.PathKey, idxPath)
    try body
    finally {
      spark.conf.set(TermProbeRule.ConfKey, "false")
      spark.conf.unset(TermProbeRule.PathKey)
    }
  }

  private def scanForm = {
    val tk = split(col("text"), " ", -1)
    docs
      .where(array_contains(tk, "dup") && array_contains(tk, "window") &&
        col("n_chars") > 0)
      .select("doc_id", "n_chars")
  }

  test("the rewrite turns term predicates into a pruned postings semi-join") {
    withRule {
      val plan = scanForm.queryExecution.executedPlan.toString
      assert(plan.contains("LeftSemi"), plan)
      assert(plan.contains("PartitionFilters: [bucket"), plan)
      assert(plan.contains("n_chars"), plan)
    }
  }

  test("the rewrite is row-invisible vs the scan form") {
    val expected = scanForm.orderBy("doc_id").collect().toSeq
    val got = withRule(scanForm.orderBy("doc_id").collect().toSeq)
    assert(got.nonEmpty, "fixture must produce matches")
    assert(got == expected)
  }

  test("without the conf the plan is untouched") {
    val plan = scanForm.queryExecution.executedPlan.toString
    assert(!plan.contains("LeftSemi"), plan)
  }

  test("a different separator does not match the index discipline") {
    withRule {
      val tk = split(col("text"), ",", -1)
      val plan = docs.where(array_contains(tk, "dup")).select("doc_id")
        .queryExecution.executedPlan.toString
      assert(!plan.contains("LeftSemi"), plan)
    }
  }
}
