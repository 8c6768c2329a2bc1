package graft

import org.apache.spark.sql.functions._
import graft.operators.NearDup

/** MinHash near-dup invariants on real sf0.001 documents (which contain
  * seeded exact and near duplicates). */
class NearDupSpec extends SparkSpec {

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet").cache()
  private lazy val pairs = NearDup.nearDuplicatePairs(docs).cache()

  test("finds the seeded duplicates (non-empty result)") {
    assert(pairs.count() > 0L)
  }

  test("fused MinhashSigs kernel equals the built-in composition bit-for-bit") {
    val sh = NearDup.docShingles(docs, "doc_id", "text", NearDup.Params())
    val fused = NearDup
      .withMinhashSignature(sh, "shingles", "sig", 12)
      .select(col("doc_id"), col("sig"))
    val composed = NearDup
      .withMinhashSignatureComposed(sh, "shingles", "sig", 12)
      .select(col("doc_id"), col("sig").as("sig_c"))
    val mismatches = fused.join(composed, "doc_id")
      .where(col("sig") =!= col("sig_c"))
      .count()
    assert(mismatches === 0L)
  }

  test("every reported pair clears the Jaccard threshold and is ordered a < b") {
    val rows = pairs.collect()
    assert(rows.forall(_.getAs[Double]("jac") >= 0.7))
    assert(rows.forall(r => r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b")))
  }

  test("injected exact text duplicates are found with Jaccard exactly 1.0") {
    // copy 5 docs under shifted ids — every (orig, copy) pair MUST surface
    val copies = docs
      .where(col("doc_id") < 5)
      .withColumn("doc_id", col("doc_id") + 100000)
    val seeded = docs.unionByName(copies)
    val found = NearDup.nearDuplicatePairs(seeded).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) -> r.getAs[Double]("jac"))
      .toMap
    (0L until 5L).foreach { i =>
      val p = (i, i + 100000)
      assert(found.contains(p), s"exact dup pair $p not detected")
      assert(found(p) === 1.0)
    }
  }

  test("no duplicate pairs in the output") {
    assert(pairs.count() === pairs.dropDuplicates("doc_a", "doc_b").count())
  }

  test("plan contains no cartesian product or nested-loop join") {
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("giant-bucket cap bounds candidates on a mass-duplicated corpus") {
    import spark.implicits._
    // 200 identical boilerplate docs land in ONE bucket per band; the
    // cap keeps the 20 lowest ids, so pairs = C(20,2), not C(200,2)
    val boiler = spark.range(200).select(
      col("id").as("doc_id"),
      lit("exact same boilerplate text repeated across the whole corpus forever and ever").as("text"))
    val capped = NearDup.nearDuplicatePairs(
      boiler, p = NearDup.Params(maxBucket = 20))
    assert(capped.count() === 20L * 19 / 2,
      "capped bucket must yield C(cap,2) pairs")
    // recall inside the cap survives: the kept members still pair up
    assert(capped.where(col("jac") === 1.0).count() === 190L)
  }

  test("embedding near-dup bucket cap bounds candidates the same way") {
    import spark.implicits._
    val emb = graft.functions.Embedder.embedLocal("same text").toSeq
    val vecs = spark.range(100).select(col("id").as("doc_id"))
      .withColumn("embedding", typedLit(emb))
    val sig = NearDup.embeddingSignatures(vecs)
    val pairsCapped = NearDup.embeddingNearDupPairsFromSig(
      vecs, sig, maxBucket = 10)
    assert(pairsCapped.count() === 10L * 9 / 2)
  }

  test("shingling: k-shingle count is tokens-k+1; short docs shingle to whole text") {
    import spark.implicits._
    val df = Seq("a b c d e", "a b").toDF("text")
    val out = df.select(NearDup.shingles(col("text"), 3).as("sh")).collect()
    assert(out(0).getAs[scala.collection.Seq[String]]("sh") ===
      Seq("a b c", "b c d", "c d e"))
    assert(out(1).getAs[scala.collection.Seq[String]]("sh") === Seq("a b"))
  }
}
