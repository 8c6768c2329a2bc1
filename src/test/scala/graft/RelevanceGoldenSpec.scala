package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll

import graft.catalog.LibraryCatalog
import graft.catalog.Models._
import graft.functions.Embedder
import graft.functions.VectorFunctions.Cosine
import graft.sources.ChunkSources

/** The reference's relevance golden (test_e2e.py:174-190), on the
  * reference's OWN fixture (tests/chunks_test.csv, 50 chunks): the
  * crypto-mining query must surface the specific Bitcoin-electricity
  * chunk. The reference embeds with a real semantic model (Cohere,
  * embedding.py:19-82); deterministic network-free parity comes from the
  * lexical (feature-hashed bag-of-words) model — the golden chunk shares
  * its rare tokens with the query, which is exactly the signal the
  * semantic model also keys on here.
  */
class RelevanceGoldenSpec extends SparkSpec with BeforeAndAfterAll {

  private val fixture = "/root/reference/tests/chunks_test.csv"
  private lazy val warehouse = Files.createTempDirectory("graft-golden-").toString
  private lazy val catalog = new LibraryCatalog(spark, warehouse)

  /** test_e2e.py:174-181, verbatim. */
  private val goldenText =
    "Mining for cryptocurrencies like Bitcoin" +
      " consumes significant amounts of electricity and" +
      " may be contributing to global warming." +
      " Some cryptocurrencies are, by design, not reliant" +
      " on this type of processing power."
  private val query = "How do I get started with crypto mining?"

  override def afterAll(): Unit = {
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(warehouse))
    super.afterAll()
  }

  test("fixture ingests through fromChunkCsv with the e2e corpus shape") {
    val chunks = ChunkSources.fromChunkCsv(spark, fixture)
    assert(chunks.count() === 49L) // 50 lines - header
    assert(chunks.where(col("text") === goldenText).count() === 1L)
    catalog.createLibrary(
      "e2e_fixture", FlatIndexer, chunks, overwrite = true, embedder = "lexical")
    assert(catalog.chunks("e2e_fixture").count() === 49L)
  }

  test("crypto-mining query returns the reference's golden chunk top-1 (k=5, cosine)") {
    // the reference asserts membership in the k=5 results
    // (test_e2e.py:183-190); the lexical model is strong enough here to
    // pin top-1, the stricter claim
    val res = catalog
      .search("e2e_fixture", query, k = 5, metric = Cosine)
      .collect()
    assert(res.length === 5)
    assert(res.head.getAs[String]("text") === goldenText,
      s"golden chunk not top-1; got: ${res.map(_.getAs[String]("text").take(60)).mkString(" | ")}")
  }

  test("embedder survives recovery: a fresh catalog resolves lexical from meta.json") {
    val fresh = new LibraryCatalog(spark, warehouse)
    assert(fresh.readMeta("e2e_fixture").get.embedder === "lexical")
    // the recovered catalog must embed the query with the SAME model —
    // an md5-embedded query against lexical chunks would rank noise
    val res = fresh.search("e2e_fixture", query, k = 5, metric = Cosine).collect()
    assert(res.head.getAs[String]("text") === goldenText)
  }

  test("lexical model: fused LexicalBuckets kernel equals the composed pipeline") {
    val chunks = catalog.chunks("e2e_fixture").select(col("text"))
    val fused = Embedder.LexicalModel
      .embedDf(chunks, "text", "emb", Embedder.Dim)
    val composed = chunks
      .withColumn("__buckets",
        Embedder.LexicalModel.bucketsCol(col("text"), Embedder.Dim))
      .withColumn("__counts",
        Embedder.LexicalModel.countsCol(col("__buckets"), Embedder.Dim))
      .withColumn("emb_c", Embedder.LexicalModel.normalizeColComposed(col("__counts")))
      .select(col("text"), col("emb_c"))
    val mismatches = fused.join(composed, "text")
      .where(col("emb") =!= col("emb_c"))
      .count()
    assert(mismatches === 0L)
  }

  test("lexical model: Catalyst and driver-local forms agree bit-exactly") {
    val texts = catalog.chunks("e2e_fixture").select("text").collect().map(_.getString(0))
    val viaCol = catalog.chunks("e2e_fixture")
      .select(col("text"), col("embedding")).collect()
      .map(r => r.getString(0) -> r.getSeq[Float](1).toArray).toMap
    texts.foreach { t =>
      val local = Embedder.LexicalModel.embedLocal(t, Embedder.Dim)
      assert(java.util.Arrays.equals(viaCol(t), local),
        s"catalyst/local mismatch for: ${t.take(50)}")
    }
  }
}
