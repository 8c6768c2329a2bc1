package graft

import org.apache.spark.sql.functions._
import graft.operators.JaccardJoin

/** Exact n-gram Jaccard self-join with prefix filtering: equivalence
  * with the naive all-pairs definition (completeness — the prefix filter
  * must drop NOTHING above threshold), threshold-boundary exactness, and
  * the no-cartesian plan shape. */
class JaccardJoinSpec extends SparkSpec {

  private def docs = spark.read
    .parquet(s"$sfDir/documents.parquet")
    .select("doc_id", "text")

  private def key(r: org.apache.spark.sql.Row) =
    (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3))

  test("prefix-filtered join == naive all-pairs on real documents") {
    val fast = JaccardJoin.selfJoin(docs, "doc_id", "text")
      .collect().map(key).sortBy(_.toString())
    val naive = JaccardJoin.naiveSelfJoin(docs, "doc_id", "text")
      .collect().map(key).sortBy(_.toString())
    assert(fast.nonEmpty, "fixture must produce at least one pair")
    assert(fast.sameElements(naive))
  }

  test("rational threshold is an exact boundary (integer cross-multiply)") {
    import spark.implicits._
    // J exactly 3/5: |A|=|B|=4 shingles, 3 common, union 5.
    // 6-token docs -> 4 trigram shingles each; first 3 shingles shared.
    val a = "w1 w2 w3 w4 w5 xa"
    val b = "w1 w2 w3 w4 w5 xb"
    val df = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val at = JaccardJoin.selfJoin(df, "doc_id", "text", k = 3, tNum = 3, tDen = 5)
      .collect()
    assert(at.length === 1 && at.head.getInt(2) === 3 && at.head.getInt(3) === 5)
    // one notch above 3/5 excludes the same pair — no float fuzz
    val above = JaccardJoin.selfJoin(df, "doc_id", "text", k = 3, tNum = 61, tDen = 100)
      .collect()
    assert(above.isEmpty)
  }

  test("plan has no cartesian stage and candidates come from an equi-join") {
    val plan = JaccardJoin.selfJoin(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
