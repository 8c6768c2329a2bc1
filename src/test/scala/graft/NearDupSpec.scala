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

  test("first-collision enumeration equals join-then-DISTINCT under mixed cap survival") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // three 20-member clusters of NEAR-identical vectors: per-doc tiny
    // perturbations flip sign-LSH bits only where a plane dot is near
    // zero, so cluster members collide in SOME tables and not others,
    // and a small cap binds differently per (table, sig) bucket — the
    // exact mask interplay the first-collision filter must get right
    val base = graft.functions.Embedder.embedLocal("cluster base text").toSeq
    val vecsB = spark.range(60).select(col("id").as("doc_id"))
      .withColumn("__base", typedLit(base))
      .withColumn("embedding",
        expr("transform(sequence(0, 31), d -> " +
          "CAST(element_at(__base, d + 1) + (doc_id % 3) * 0.31 + " +
          "(doc_id % 20) * 0.0021 * CAST(d % 5 = CAST(doc_id % 5 AS INT) AS INT) AS FLOAT))"))
      .drop("__base")
    val sig = NearDup.embeddingSignatures(vecsB).cache()
    val mb = 7
    // reference: the SAME deterministic cap, then the naive per-table
    // join + DISTINCT the first-collision form replaced
    val w = Window.partitionBy("table_idx", "sig").orderBy("doc_id")
    val capped = sig.withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= mb).drop("__rk")
    val ref = capped.select(col("doc_id").as("id_a"), col("table_idx"), col("sig"))
      .join(capped.select(col("doc_id").as("id_b"), col("table_idx"), col("sig")),
        Seq("table_idx", "sig"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // candidate surface of the production path: minCosine = -1 keeps
    // every candidate, so the verify stage is a pass-through
    val got = NearDup.embeddingNearDupPairsFromSig(
        vecsB, sig, minCosine = -1.0, maxBucket = mb)
      .select("doc_a", "doc_b")
    val gotRows = got.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(gotRows.length === gotRows.distinct.length,
      "first-collision must emit each pair exactly once")
    assert(gotRows.toSet === ref,
      "first-collision pair set must equal the capped join+DISTINCT set")
    assert(ref.nonEmpty, "fixture must actually produce candidates")
    // the fixture genuinely stresses mixed survival: at least one doc
    // must be capped out of SOME table while surviving another
    val survival = capped.groupBy("doc_id").count().collect()
    assert(survival.exists(_.getLong(1) < 8) && survival.exists(_.getLong(1) > 0),
      "fixture must produce partial cap survival to stress the mask")
    sig.unpersist()
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
