package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll

import graft.catalog.LibraryCatalog
import graft.catalog.Models.FlatIndexer
import graft.sources.ChunkSources

/** CSV/JSONL ingest adapters → catalog round trip. */
class ChunkSourcesSpec extends SparkSpec with BeforeAndAfterAll {

  private lazy val dir = Files.createTempDirectory("graft-src-").toString

  override def afterAll(): Unit = {
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    super.afterAll()
  }

  test("chunk CSV (reference fixture shape) loads, groups, and is searchable") {
    val csv = s"$dir/chunks.csv"
    Files.writeString(Paths(csv),
      """chunk,document_name
        |"The James Webb telescope observes in infrared.",Space Telescope
        |"Its mirror spans six and a half meters.",Space Telescope
        |"Bitcoin mining consumes considerable electricity.",Cryptocurrency
        |"Proof of work secures the ledger.",Cryptocurrency
        |"Solar panels convert light to power.",Renewables
        |""".stripMargin)
    val chunks = ChunkSources.fromChunkCsv(spark, csv)
    assert(chunks.count() === 5L)
    assert(chunks.select("document_id").distinct().count() === 3L)
    // ids are deterministic slug#ordinal
    val ids = chunks.select("id").collect().map(_.getString(0)).toSet
    assert(ids.contains("space-telescope#1") && ids.contains("cryptocurrency#2"))

    val catalog = new LibraryCatalog(spark, s"$dir/wh")
    catalog.createLibrary("csv_lib", FlatIndexer, chunks, overwrite = true)
    assert(catalog.chunks("csv_lib").count() === 5L)
    assert(catalog.documents("csv_lib").count() === 3L)
    // self-text search hits its own chunk (md5 embedder exact match)
    val hit = catalog
      .search("csv_lib", "Proof of work secures the ledger.", k = 1)
      .head()
    assert(hit.getAs[String]("document_id") === "doc-cryptocurrency")
    // tag filter by document slug works through metadata.tags
    val tagged = catalog.search("csv_lib", "anything", k = 5,
      filterTags = Seq("renewables"))
    assert(tagged.count() <= 5)
  }

  test("nested create-library JSON flattens documents into catalog-ready chunks") {
    val json = s"$dir/nested.json"
    Files.writeString(Paths(json),
      """[
        |  {"title": "Space Telescope", "description": "optics",
        |   "metadata": {"source": "string", "tags": ["test", "space"]},
        |   "chunks": [{"text": "JWST observes infrared."},
        |              {"text": "Mirrors are beryllium."}]},
        |  {"title": "Crypto", "metadata": {"tags": ["test"]},
        |   "chunks": [{"text": "Mining consumes electricity."}]}
        |]""".stripMargin)
    val chunks = ChunkSources.fromNestedJson(spark, json)
    assert(chunks.count() === 3L)
    val byId = chunks.collect().map(r => r.getAs[String]("id") -> r).toMap
    assert(byId.keySet === Set("space-telescope#1", "space-telescope#2", "crypto#1"))
    assert(byId("space-telescope#1").getAs[String]("document_id") === "doc-space-telescope")

    // end to end: ingest, then the derived documents view re-aggregates
    // the document-level fields the nested shape carried
    val catalog = new LibraryCatalog(spark, s"$dir/wh_nested")
    catalog.createLibrary("nested_lib", FlatIndexer, chunks, overwrite = true)
    val docs = catalog.documents("nested_lib").collect()
      .map(r => r.getAs[String]("id") -> r).toMap
    assert(docs.keySet === Set("doc-space-telescope", "doc-crypto"))
    assert(docs("doc-space-telescope").getAs[String]("title") === "Space Telescope")
    assert(docs("doc-space-telescope").getAs[String]("description") === "optics")
    assert(docs("doc-space-telescope").getAs[Long]("chunk_count") === 2L)
    assert(docs("doc-crypto").getAs[scala.collection.Seq[String]]("tags") === Seq("test"))
  }

  test("JSONL source passes ids through and defaults missing documents") {
    val jsonl = s"$dir/docs.jsonl"
    Files.writeString(Paths(jsonl),
      """{"id": "a", "text": "first record"}
        |{"id": "b", "text": "second record", "document_id": "doc-x"}
        |""".stripMargin)
    val df = ChunkSources.fromJsonl(spark, jsonl)
    val rows = df.collect().map(r => (r.getAs[String]("id"), r.getAs[String]("document_id"))).toMap
    assert(rows("a") === "doc-default")
    assert(rows("b") === "doc-x")
  }

  private def Paths(p: String) = java.nio.file.Paths.get(p)
}
