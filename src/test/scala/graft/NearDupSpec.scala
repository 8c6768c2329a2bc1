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

  test("no pair-keyed dedup aggregate remains in either band-path plan") {
    // the first-collision rewrite's whole point: the join-then-DISTINCT
    // HashAggregate over (id_a, id_b) — a bands-fold duplicate stream
    // into the operator's biggest exchange — must not reappear. The
    // only aggregates left are doc-keyed (survival maps). Attribute
    // names print as name#id, so `keys=[id_a#` matches exactly a
    // pair-keyed aggregate and nothing else.
    val selfPlan = NearDup.nearDuplicatePairs(docs)
      .queryExecution.executedPlan.toString
    assert(!selfPlan.contains("keys=[id_a#"), selfPlan.take(4000))
    val half = docs.where(col("doc_id") % 2 === 0)
    val incPlan = NearDup
      .incrementalNearDupPairs(half, docs.where(col("doc_id") % 2 === 1))
      .queryExecution.executedPlan.toString
    assert(!incPlan.contains("keys=[id_new#"), incPlan.take(4000))
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

  test("vec-space near-dup (dim 64, center 0) equals naive bucket+cosine reference") {
    import org.apache.spark.sql.expressions.Window
    // the q_embed_neardup_vec path on a perturbed-replica fixture built
    // the way SynthScale builds the synthetic corpora: 30 real 64-dim
    // base vectors, 4 replicas each, replica r > 0 shifted by a seeded
    // per-(vec,replica,dim) offset scaled by a per-(vec,replica) eps —
    // same-base pairs land on BOTH sides of the 0.99 verify threshold
    val base = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .where(col("vec_id") < 30)
      .select(col("vec_id"), col("embedding"))
    val reps = (0 until 4).map { r =>
      if (r == 0) base
      else {
        val eps = pmod(xxhash64(lit("veps"), col("vec_id"), lit(r)), lit(1000L))
          .cast("double") / 1000.0 * 0.0395 + 0.0005
        base.select(
          (col("vec_id") + lit(r * 1000L)).as("vec_id"),
          transform(col("embedding"), (x, j) =>
            (x.cast("double") + eps *
              (pmod(xxhash64(lit("vdim"), col("vec_id"), lit(r), j),
                lit(20001L)).cast("double") / 10000.0 - 1.0))
              .cast("float")).as("embedding"))
      }
    }.reduce(_ unionByName _)
    val sig = NearDup.embeddingSignatures(
      reps, "vec_id", "embedding", NearDup.VecLshParams, center = 0f).cache()
    val got = NearDup.embeddingNearDupPairsFromSig(
        reps, sig, "vec_id", "embedding",
        minCosine = 0.99, numTables = NearDup.VecLshParams.numTables)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // naive reference: any-table bucket collision (same deterministic
    // cap, irrelevant at this size) then exact cosine
    val naive = sig.select(col("vec_id").as("id_a"), col("table_idx"), col("sig"))
      .join(sig.select(col("vec_id").as("id_b"), col("table_idx"), col("sig")),
        Seq("table_idx", "sig"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
      .join(reps.select(col("vec_id").as("id_a"), col("embedding").as("va")), "id_a")
      .join(reps.select(col("vec_id").as("id_b"), col("embedding").as("vb")), "id_b")
      .withColumn("cos",
        graft.functions.VectorFunctions.cosineSimilarity(col("va"), col("vb")))
      .where(col("cos") >= 0.99)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === naive)
    assert(got.nonEmpty, "fixture must produce accepted pairs")
    // the threshold must do real borderline work on this fixture: some
    // same-base replica pairs are candidates yet fail the 0.99 verify
    val candidates = sig.select(col("vec_id").as("id_a"), col("table_idx"), col("sig"))
      .join(sig.select(col("vec_id").as("id_b"), col("table_idx"), col("sig")),
        Seq("table_idx", "sig"))
      .where(col("id_a") < col("id_b") &&
        pmod(col("id_a"), lit(1000L)) === pmod(col("id_b"), lit(1000L)))
      .select("id_a", "id_b").distinct().count()
    assert(candidates > got.size.toLong,
      "some same-base candidate pairs must fail the cosine verify")
    sig.unpersist()
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
    // the fixture genuinely stresses mixed survival: at least ONE doc
    // must itself be capped out of SOME table while surviving another
    // (a per-doc 0 < count < numTables — the earlier exists(<max) &&
    // exists(>0) form was satisfiable by full survivors alone)
    val survival = capped.groupBy("doc_id").count().collect()
    assert(
      survival.exists(r =>
        r.getLong(1) > 0 && r.getLong(1) < NearDup.EmbedLshParams.numTables),
      "fixture must produce a partially-surviving doc to stress the mask")
    sig.unpersist()
  }

  test("kernel rejects a numTables smaller than the sig's actual table count") {
    import spark.implicits._
    val emb = graft.functions.Embedder.embedLocal("guard text").toSeq
    val vecs = spark.range(30).select(col("id").as("doc_id"))
      .withColumn("embedding", typedLit(emb))
    val sig = NearDup.embeddingSignatures(vecs) // built with 8 tables
    // claiming 4 tables would let a first collision in table >= 4
    // escape the unrolled earlier-collision test and re-emit pairs —
    // the kernel must fail LOUDLY instead of silently duplicating
    val ex = intercept[Exception] {
      NearDup.embeddingNearDupPairsFromSig(vecs, sig, numTables = 4).count()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("numBuckets")), ex.toString)
  }

  test("band-path first-collision equals join-then-DISTINCT under mixed cap survival") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // three 20-member families of near-identical TEXTS: per-doc token
    // tweaks change SOME minhash band keys and not others, so family
    // members share some band buckets only, and a small cap binds
    // differently per (band, band_key) bucket — the survival-map
    // interplay the band path's first-collision filter must get right
    val docs = spark.range(60).select(
      col("id").as("doc_id"),
      concat(
        lit("shared boilerplate tokens one two three four five six seven eight nine ten "),
        lit("family "), (col("id") % 3).cast("string"),
        lit(" variant token "), (col("id") % 20).cast("string")).as("text"))
    val p = NearDup.Params(maxBucket = 7, threshold = 0.0)
    // reference: the SAME deterministic cap, then join + DISTINCT
    val bands = NearDup.bandRows(
      NearDup.docShingles(docs, "doc_id", "text", p), "doc_id", p)
    val w = Window.partitionBy("band", "band_key").orderBy("doc_id")
    val capped = bands.withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= p.maxBucket).drop("__rk").cache()
    val ref = capped.select(col("doc_id").as("id_a"), col("band"), col("band_key"))
      .join(capped.select(col("doc_id").as("id_b"), col("band"), col("band_key")),
        Seq("band", "band_key"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // production path with threshold 0.0: the Jaccard verify is a
    // pass-through, so the output IS the candidate pair set
    val gotRows = NearDup.nearDuplicatePairs(docs, p = p)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(gotRows.length === gotRows.distinct.length,
      "band first-collision must emit each pair exactly once")
    assert(gotRows.toSet === ref,
      "band first-collision pair set must equal the capped join+DISTINCT set")
    assert(ref.nonEmpty, "fixture must actually produce candidates")
    // the fixture genuinely stresses mixed survival per doc
    val survival = capped.groupBy("doc_id").count().collect()
    assert(
      survival.exists(r => r.getLong(1) > 0 && r.getLong(1) < p.bands),
      "fixture must produce a partially-surviving doc to stress the map")
    capped.unpersist()
  }

  test("incremental first-collision equals join-then-DISTINCT under mixed cap survival") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // same family construction, split batch-vs-corpus with an id
    // overlap (re-ingested unchanged docs) so the =!= self-pair guard
    // is exercised alongside the two independent survival maps
    def corpus(ids: org.apache.spark.sql.DataFrame) = ids.select(
      col("id").as("doc_id"),
      concat(
        lit("shared boilerplate tokens one two three four five six seven eight nine ten "),
        lit("family "), (col("id") % 3).cast("string"),
        lit(" variant token "), (col("id") % 20).cast("string")).as("text"))
    val existing = corpus(spark.range(40).toDF("id"))
    val incoming = corpus(spark.range(30, 70).toDF("id")) // ids 30..39 overlap
    val p = NearDup.Params(maxBucket = 7, threshold = 0.0)
    def cappedBands(df: org.apache.spark.sql.DataFrame) = {
      val w = Window.partitionBy("band", "band_key").orderBy("doc_id")
      NearDup.bandRows(NearDup.docShingles(df, "doc_id", "text", p), "doc_id", p)
        .withColumn("__rk", row_number().over(w))
        .where(col("__rk") <= p.maxBucket).drop("__rk")
    }
    val ref = cappedBands(incoming)
      .select(col("doc_id").as("id_new"), col("band"), col("band_key"))
      .join(cappedBands(existing)
        .select(col("doc_id").as("id_old"), col("band"), col("band_key")),
        Seq("band", "band_key"))
      .where(col("id_new") =!= col("id_old"))
      .select("id_new", "id_old").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val gotRows = NearDup.incrementalNearDupPairs(existing, incoming, p = p)
      .select("id_new", "id_old")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(gotRows.length === gotRows.distinct.length,
      "incremental first-collision must emit each pair exactly once")
    assert(gotRows.toSet === ref,
      "incremental first-collision pair set must equal the join+DISTINCT set")
    assert(ref.nonEmpty, "fixture must actually produce candidates")
    assert(!gotRows.exists(r => r._1 == r._2), "no degenerate self-pairs")
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
