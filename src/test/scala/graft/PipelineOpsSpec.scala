package graft

import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis
import graft.operators.{Multimodal, NearDup, SimHash}

/** Training-pipeline operators: SimHash, embedding near-dup, text
  * analysis, multimodal stub-decode plumbing. */
class PipelineOpsSpec extends SparkSpec {

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet").cache()

  test("simhash: injected exact duplicates surface at hamming 0") {
    val copies = docs.where(col("doc_id") < 3)
      .withColumn("doc_id", col("doc_id") + 200000)
    val found = SimHash.nearDuplicatePairs(docs.unionByName(copies)).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) -> r.getAs[Long]("hamming"))
      .toMap
    (0L until 3L).foreach { i =>
      assert(found.get((i, i + 200000)).contains(0L), s"dup $i not at hamming 0")
    }
  }

  test("simhash: reported pairs respect the maxHamming bound and ordering") {
    val maxH = SimHash.Params().maxHamming.toLong
    val rows = SimHash.nearDuplicatePairs(docs).collect()
    assert(rows.forall(_.getAs[Long]("hamming") <= maxH))
    assert(rows.forall(r => r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b")))
  }

  test("simhash: 64-bit fingerprints use the full bit range and chunks cover 16 bits each") {
    // a corpus-sized sample must produce fingerprints with high-32 bits
    // set (the old 32-bit layout left them zero — 1,024 effective
    // buckets, quadratic candidates at scale)
    val fps = SimHash.fingerprints(docs, "doc_id", "text").limit(200)
      .collect().map(_.getAs[Long]("simhash"))
    assert(fps.exists(f => (f >>> 32) != 0L),
      "no fingerprint uses the high 32 bits — layout regressed to 32-bit")
    // and the sign bit is reachable (bit 63 votes on hv1 bit 31)
    assert(fps.exists(_ < 0L) || fps.length < 50,
      "no negative fingerprint in 200 docs — bit 63 never set")
  }

  test("simhash: first-collision enumeration equals join-then-DISTINCT under mixed cap survival") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // near-duplicate texts whose fingerprints differ in a few bits:
    // chunks collide variably across docs, and a small cap binds
    // per-bucket — stressing the cap-survival mask the first-collision
    // filter consults
    val words = (0 until 18).map(i => s"w$i").mkString(" ")
    val fixture = spark.range(80).select(
      col("id").as("doc_id"),
      concat(lit(words), lit(" tail"), (col("id") % 7).cast("string")).as("text"))
    val p = SimHash.Params(maxBucket = 5)
    // reference: same fingerprints, same deterministic cap, then the
    // per-chunk join + DISTINCT the first-collision form replaced
    val fp = SimHash.fingerprints(fixture, "doc_id", "text", p)
    val chunkVals = (0 until p.chunks).map(c =>
      shiftright(col("simhash"), c * p.chunkBits)
        .bitwiseAND(lit((1L << p.chunkBits) - 1)))
    val w = Window.partitionBy("chunk_idx", "chunk_val").orderBy("doc_id")
    val chunked = fp.select(
        col("doc_id"), col("simhash"),
        posexplode(array(chunkVals: _*)).as(Seq("chunk_idx", "chunk_val")))
      .withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= p.maxBucket).drop("__rk")
    val ham = bit_count(col("sh_a").bitwiseXOR(col("sh_b")))
    val ref = chunked
      .select(col("doc_id").as("id_a"), col("simhash").as("sh_a"),
        col("chunk_idx"), col("chunk_val"))
      .join(chunked.select(col("doc_id").as("id_b"), col("simhash").as("sh_b"),
        col("chunk_idx"), col("chunk_val")), Seq("chunk_idx", "chunk_val"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sh_a"), col("sh_b"))
      .distinct()
      .where(ham <= p.maxHamming)
      .select(col("id_a"), col("id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val gotRows = SimHash.nearDuplicatePairs(fixture, p = p)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(gotRows.length === gotRows.distinct.length,
      "first-collision must emit each pair exactly once")
    assert(gotRows.toSet === ref,
      "first-collision pair set must equal the capped join+DISTINCT set")
    assert(ref.nonEmpty, "fixture must actually produce pairs")
    // partial survival must actually occur, or the mask isn't stressed
    val survival = chunked.groupBy("doc_id").count().collect()
    assert(survival.exists(_.getLong(1) < p.chunks),
      "fixture must cap some doc out of at least one chunk bucket")
  }

  test("simhash: fused kernel equals the built-in composition bit-for-bit") {
    val fused = SimHash.fingerprints(docs, "doc_id", "text")
    val composed = SimHash.fingerprintsComposed(docs, "doc_id", "text")
      .withColumnRenamed("simhash", "simhash_c")
    val mismatches = fused.join(composed, "doc_id")
      .where(col("simhash") =!= col("simhash_c"))
      .count()
    assert(mismatches === 0L)
  }

  test("simhash: identical token multisets give identical fingerprints") {
    import spark.implicits._
    val df = Seq((1L, "a b c"), (2L, "a b c"), (3L, "x y z")).toDF("doc_id", "text")
    val fp = SimHash.fingerprints(df, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("simhash")).toMap
    assert(fp(1L) === fp(2L))
    assert(fp(1L) !== fp(3L))
  }

  test("embedding near-dup: exact-text duplicates found with cosine ~1") {
    import graft.functions.Embedder
    val copies = docs.where(col("doc_id") < 3)
      .withColumn("doc_id", col("doc_id") + 300000)
    val embedded = Embedder
      .withEmbedding(docs.unionByName(copies))
      .select("doc_id", "embedding")
    val found = NearDup.embeddingNearDupPairs(embedded).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) -> r.getAs[Double]("cos"))
      .toMap
    (0L until 3L).foreach { i =>
      assert(found.contains((i, i + 300000)), s"dup $i not found")
      assert(math.abs(found((i, i + 300000)) - 1.0) < 1e-9)
    }
  }

  test("language ID: stopword voting picks the obvious language on real text") {
    import spark.implicits._
    val df = Seq(
      (1L, "the cat and the dog of the house is in a box"),
      (2L, "der hund und die katze das ist nicht ein haus"),
      (3L, "el perro la casa de los gatos que es una mesa")).toDF("doc_id", "text")
    val scored = df
      .select(col("doc_id"), split(col("text"), " ", -1).as("tk"))
      .select(
        (Seq(col("doc_id")) ++ TextAnalysis.stopwords.map { case (l, ws) =>
          TextAnalysis.stopwordHits(col("tk"), ws).as(s"score_$l")
        }): _*)
      .select(col("doc_id"), TextAnalysis.predictedLang(l => col(s"score_$l")).as("p"))
      .collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(scored(1L) === "en")
    assert(scored(2L) === "de")
    assert(scored(3L) === "es")
  }

  test("quality score stays within [0, 1]") {
    val withTk = docs
      .select(col("doc_id"), col("text"), split(col("text"), " ", -1).as("tk"))
      .select(col("doc_id"),
        TextAnalysis.qualityScore(
          size(col("tk")),
          (length(col("text")) - size(col("tk")) + 1).cast("double") / size(col("tk")),
          TextAnalysis.punctCount(col("text")).cast("double") / length(col("text")),
          TextAnalysis.stopwordHits(col("tk"), TextAnalysis.stopwords.toMap.apply("en"))
            .cast("double") / size(col("tk"))).as("q"))
      .collect()
    withTk.foreach { r =>
      val q = r.getAs[Double]("q")
      assert(q >= 0.0 && q <= 1.0, s"quality $q out of range")
    }
  }

  test("winnowing fingerprint is a subset of gram hashes and shrinks the set") {
    val out = docs
      .limit(20)
      .select(col("doc_id"), TextAnalysis.charCodes(col("text")).as("__codes"))
      .select(col("doc_id"), TextAnalysis.gramHashesFromCodes(col("__codes"), 8).as("g"))
      .select(col("doc_id"), col("g"), TextAnalysis.winnow(col("g"), 4).as("fp"))
      .collect()
    out.foreach { r =>
      val g = r.getAs[scala.collection.Seq[Long]]("g").toSet
      val fp = r.getAs[scala.collection.Seq[Long]]("fp")
      assert(fp.nonEmpty && fp.toSet.subsetOf(g))
      assert(fp.length < g.size)
      assert(fp.distinct.length === fp.length)
    }
  }

  test("multimodal: stub decode preserves rows, mime, and byte sizes") {
    import spark.implicits._
    val media = Multimodal.asMedia(
      docs.limit(50).select(
        col("doc_id").as("id"),
        col("text").cast("binary").as("media"),
        lit("image/png").as("mime")))
    val decoded = Multimodal.decode(media).collect()
    assert(decoded.length === 50)
    decoded.foreach { d =>
      assert(d.mime === "image/png")
      assert(d.byteSize > 0 && d.width === (d.byteSize % 1920).toInt)
      assert(d.features.length === 32)
      assert(d.f0 >= 0.0 && d.f0 < 1.0)
    }
  }

  test("multimodal: frame sampling emits n frames per long payload, 1 for short") {
    import spark.implicits._
    val media = graft.operators.Multimodal.asMedia(
      Seq((1L, "x" * 500), (2L, "short"))
        .toDF("id", "text")
        .select(col("id"), col("text").cast("binary").as("media"), lit("video/mp4").as("mime")))
    val frames = graft.operators.Multimodal.frameSamples(media, nFrames = 4, window = 64)
      .collect().groupBy(_.id)
    assert(frames(1L).length === 4)
    assert(frames(1L).map(_.frame_idx).sorted.toSeq === Seq(0, 1, 2, 3))
    assert(frames(2L).length === 1)
    // uniform payload → identical frame hashes; distinct payloads differ
    assert(frames(1L).map(_.frame_hash).distinct.length === 1)
    assert(frames(1L).head.frame_hash !== frames(2L).head.frame_hash)
  }

  test("multimodal: resize stub preserves aspect ratio and caps dims") {
    import graft.operators.Multimodal.{DecodedMedia, resizeStub}
    val d = DecodedMedia(1L, "image/png", 100L, 1600, 800, 0.5, Array.empty)
    val r = resizeStub(d, 400, 400)
    assert(r.width === 400 && r.height === 200) // scale 0.25, ratio kept
    val small = resizeStub(DecodedMedia(2L, "image/png", 10L, 100, 50, 0.1, Array.empty), 400, 400)
    assert(small.width === 100 && small.height === 50) // never upscales
  }

  test("multimodal: decode is deterministic and keyed only by bytes") {
    import spark.implicits._
    val media = Multimodal.asMedia(
      Seq((1L, "same payload"), (2L, "same payload"))
        .toDF("id", "text")
        .select(col("id"), col("text").cast("binary").as("media"), lit("audio/wav").as("mime")))
    val d = Multimodal.decode(media).collect().sortBy(_.id)
    assert(d(0).f0 === d(1).f0)
    assert(d(0).features.toSeq === d(1).features.toSeq)
  }
}
