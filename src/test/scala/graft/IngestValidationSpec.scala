package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll

import graft.catalog.LibraryCatalog
import graft.catalog.Models._
import graft.operators.FlatKnn
import graft.functions.VectorFunctions

/** Ingest field-validation parity with the reference
  * (`app/core/models/chunk.py:25-71`: page >= 0, non-blank tags, 1-D
  * non-empty embedding; `app/core/indexers/hnsw.py:553-563`: dimension
  * consistency) plus the NULLS-LAST guarantee in FlatKnn: a
  * wrong-dimension embedding must be rejected at ingest, and even if a
  * NULL distance ever reaches a ranking it must sort last, never first.
  */
class IngestValidationSpec extends SparkSpec with BeforeAndAfterAll {

  private lazy val warehouse =
    Files.createTempDirectory("graft-val-").toString
  private lazy val catalog = new LibraryCatalog(spark, warehouse)

  override def afterAll(): Unit = {
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(warehouse))
    super.afterAll()
  }

  private def meta(page: Integer, tags: Seq[String]) = struct(
    lit(null).cast("string").as("source"),
    lit(null).cast("timestamp").as("created_at"),
    typedLit(tags).as("tags"),
    lit(null).cast("string").as("author"),
    lit(null).cast("string").as("title"),
    lit(null).cast("string").as("description"),
    lit(page).cast("int").as("page"))

  /** One-row chunk frame with a caller-supplied embedding. */
  private def row(
      id: String,
      emb: Seq[Float],
      page: Integer = null,
      tags: Seq[String] = Seq("t")): DataFrame = {
    import spark.implicits._
    Seq(id).toDF("id")
      .select(
        col("id"),
        lit("doc-0").as("document_id"),
        lit("some text").as("text"),
        typedLit(emb).cast(chunkSchema("embedding").dataType).as("embedding"),
        meta(page, tags).as("metadata"))
  }

  private def assertRejected(body: => Any, needle: String): Unit = {
    val e = intercept[Exception](body)
    val msgs = Iterator
      .iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse(""))
      .mkString(" | ")
    assert(msgs.contains(needle), s"expected '$needle' in: $msgs")
  }

  test("wrong-dimension embedding is rejected at createLibrary") {
    assertRejected(
      catalog.createLibrary("v_dim", FlatIndexer, row("c1", Seq(1f, 2f, 3f)),
        dim = 4, overwrite = true),
      "embedding dimension mismatch")
  }

  test("wrong-dimension embedding is rejected at addChunks") {
    catalog.createLibrary("v_add", FlatIndexer, row("c1", Seq(1f, 2f, 3f, 4f)),
      dim = 4, overwrite = true)
    assertRejected(
      catalog.addChunks("v_add", row("c2", Seq(1f, 2f))),
      "embedding dimension mismatch")
    // the failed ingest did not corrupt the library
    assert(catalog.chunks("v_add").count() === 1L)
  }

  test("null embeddings still pass through to the embed stage") {
    import spark.implicits._
    val df = Seq("cN").toDF("id")
      .select(col("id"), lit("doc-0").as("document_id"),
        lit("text here").as("text"), meta(null, Seq("t")).as("metadata"))
    catalog.createLibrary("v_null", FlatIndexer, df, dim = 4, overwrite = true)
    assert(catalog.chunks("v_null").where(col("embedding").isNull).count() === 0L)
  }

  test("negative page is rejected (chunk.py:36-42 parity)") {
    assertRejected(
      catalog.createLibrary("v_page", FlatIndexer,
        row("c1", Seq(1f, 2f, 3f, 4f), page = -1), dim = 4, overwrite = true),
      "page must be non-negative")
  }

  test("blank tag strings are rejected (chunk.py:25-34 parity)") {
    assertRejected(
      catalog.createLibrary("v_tags", FlatIndexer,
        row("c1", Seq(1f, 2f, 3f, 4f), tags = Seq("ok", "  ")),
        dim = 4, overwrite = true),
      "tags cannot be empty strings")
  }

  test("FlatKnn ranks NULL distances last — a wrong-dim row cannot enter top-k") {
    import spark.implicits._
    // three valid 2-dim rows + one poisoned 3-dim row (NULL distance)
    val df = Seq(
      ("a", Seq(0f, 0f)),
      ("b", Seq(1f, 0f)),
      ("poison", Seq(1f, 1f, 1f)),
      ("c", Seq(0f, 2f))).toDF("vec_id", "embedding")
    val top2 = FlatKnn.search(df, Seq(0f, 0f), 2, VectorFunctions.Euclidean)
      .collect()
    assert(top2.map(_.getString(0)).toSeq === Seq("a", "b"))
    // same guarantee on the score-quirk and extra-columns paths
    val quirk = FlatKnn.searchWithScore(df, Seq(0f, 0f), 3,
      VectorFunctions.Euclidean, VectorFunctions.Cosine).collect()
    assert(!quirk.map(_.getString(0)).contains("poison"))
    val withCols = FlatKnn.searchWithColumns(df, Seq(0f, 0f), 3,
      VectorFunctions.Euclidean, "vec_id", "embedding", Nil).collect()
    assert(!withCols.map(_.getString(0)).contains("poison"))
  }
}
