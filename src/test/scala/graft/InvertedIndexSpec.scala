package graft

import org.apache.spark.sql.functions._

import graft.operators.InvertedIndex

/** InvertedIndex semantics pinned against index-free corpus-scan
  * derivations (the postings join must be invisible), the driver/Catalyst
  * bucket-hash twins proved equal over the whole vocabulary, and the plan
  * claim that makes a persisted index worth having: a lookup reads ONLY
  * the query terms' bucket partitions. */
class InvertedIndexSpec extends SparkSpec {

  private lazy val docs =
    spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")

  private lazy val idxPath = {
    val p = java.nio.file.Files
      .createTempDirectory("invidx_spec").toString + "/postings"
    InvertedIndex.build(docs, p)
    p
  }
  private lazy val idx = InvertedIndex.read(spark, idxPath)

  private def naivePhraseCount(a: String, b: String) =
    docs
      .select(col("doc_id"), split(col("text"), " ", -1).as("tk"))
      .select(
        col("doc_id"),
        expr(
          s"CASE WHEN size(tk) < 2 THEN 0 ELSE size(filter(" +
            s"sequence(0, size(tk) - 2), " +
            s"i -> tk[i] = '$a' AND tk[i + 1] = '$b')) END").as("n"))
      .where(col("n") > 0)

  test("driver bucketOf equals the Catalyst bucketCol over the whole vocab") {
    val rows = docs
      .select(explode(split(col("text"), " ", -1)).as("term"))
      .where(length(col("term")) > 0)
      .distinct()
      .withColumn("b", InvertedIndex.bucketCol(col("term")))
      .collect()
    assert(rows.length > 10)
    rows.foreach { r =>
      assert(
        r.getInt(1) === InvertedIndex.bucketOf(r.getString(0)),
        s"bucket mismatch for term '${r.getString(0)}'")
    }
  }

  test("phraseSearch equals the positional corpus-scan derivation") {
    val got = InvertedIndex
      .phraseSearch(idx, Seq("hash", "join"))
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val naive = naivePhraseCount("hash", "join")
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong))
    assert(got.nonEmpty, "fixture must contain the phrase")
    assert(got.sameElements(naive))
  }

  test("phraseSearch handles a repeated phrase token") {
    val got = InvertedIndex
      .phraseSearch(idx, Seq("join", "join"))
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val naive = naivePhraseCount("join", "join")
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong))
    assert(got.sameElements(naive))
  }

  test("conjunctiveSearch equals the array_contains corpus scan") {
    val terms = Seq("dup", "window", "spark")
    val got = InvertedIndex
      .conjunctiveSearch(idx, terms)
      .orderBy("doc_id")
      .collect()
      .map(_.getLong(0))
    val naive = docs
      .where(terms
        .map(t => array_contains(split(col("text"), " ", -1), t))
        .reduce(_ && _))
      .select("doc_id")
      .orderBy("doc_id")
      .collect()
      .map(_.getLong(0))
    assert(got.nonEmpty, "fixture must contain the conjunction")
    assert(got.sameElements(naive))
  }

  test("a term absent from the corpus yields empty results, no error") {
    assert(InvertedIndex
      .conjunctiveSearch(idx, Seq("zzz_not_a_term")).count() === 0L)
    assert(InvertedIndex
      .phraseSearch(idx, Seq("hash", "zzz_not_a_term")).count() === 0L)
  }

  test("a lookup reads only the query terms' bucket partitions") {
    val plan = InvertedIndex
      .phraseSearch(idx, Seq("hash", "join"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [bucket"),
      s"expected a bucket partition filter on the postings scan:\n$plan")
    assert(plan.contains("PushedFilters: ["),
      s"expected the term filter pushed to parquet:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"))
  }
}
