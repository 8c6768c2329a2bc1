package graft

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll

import graft.catalog.LibraryCatalog
import graft.catalog.Models._

/** Corrupt-persistence parity (the reference's corrupt-pickle cases,
  * tests/test_library_save_load.py): a truncated meta.json, a missing or
  * garbled manifest, and a manifest pointing at deleted data must each
  * fail with a CLEAN, NAMED error (or be skipped by recovery), never be
  * silently treated as "library not found" / an empty library.
  */
class CorruptPersistenceSpec extends SparkSpec with BeforeAndAfterAll {

  private lazy val warehouse =
    Files.createTempDirectory("graft-corrupt-").toString
  private lazy val catalog = new LibraryCatalog(spark, warehouse)

  override def afterAll(): Unit = {
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(warehouse))
    super.afterAll()
  }

  private def corpus(): DataFrame =
    spark.range(20).select(
      concat(lit("c"), col("id")).as("id"),
      lit("d0").as("document_id"),
      concat(lit("corrupt spec chunk "), col("id")).as("text"))

  private def mkLib(name: String): Unit =
    catalog.createLibrary(name, FlatIndexer, corpus(), overwrite = true)

  private def libFile(parts: String*): Path =
    Paths.get(warehouse, parts: _*)

  test("truncated meta.json: named corruption error, recovery skips, overwrite reclaims") {
    mkLib("c_meta")
    Files.write(libFile("c_meta", "meta.json"),
      """{"name":"c_meta","ind""".getBytes("UTF-8"))
    val e = intercept[IllegalStateException](catalog.chunks("c_meta"))
    assert(e.getMessage.contains("corrupt meta.json"))
    assert(e.getMessage.contains("c_meta"))
    // startup recovery (S4) skips the corrupt dir instead of dying
    assert(!catalog.listLibraries().exists(_.name == "c_meta"))
    // the slot still counts as occupied; overwrite=true reclaims it
    assert(catalog.exists("c_meta"))
    intercept[IllegalStateException](mkLibNoOverwrite("c_meta"))
    mkLib("c_meta")
    assert(catalog.chunks("c_meta").count() === 20L)
  }

  private def mkLibNoOverwrite(name: String): Unit =
    catalog.createLibrary(name, FlatIndexer, corpus(), overwrite = false)

  test("version dir without its manifest: torn-commit error naming the file") {
    mkLib("c_mf")
    val mf = libFile("c_mf", "v000000", "manifest.txt")
    assert(Files.deleteIfExists(mf))
    val e = intercept[IllegalStateException](catalog.chunks("c_mf").count())
    assert(e.getMessage.contains("missing its manifest.txt"))
    assert(e.getMessage.contains("v000000"))
  }

  test("garbled manifest content: named corruption error, not a bare parse crash") {
    mkLib("c_garble")
    Files.write(libFile("c_garble", "v000000", "manifest.txt"),
      "notanint=v000000".getBytes("UTF-8"))
    val e = intercept[IllegalStateException](catalog.chunks("c_garble").count())
    assert(e.getMessage.contains("corrupt manifest"))
  }

  test("partially-deleted PQ codebook artifact fails loudly, never encodes with a hole") {
    import graft.operators.PqIndex
    val docs = spark.range(40).select(
      concat(lit("p"), format_string("%03d", col("id"))).as("id"),
      lit("d0").as("document_id"),
      concat(lit("pq corrupt spec chunk "), col("id")).as("text"))
    catalog.createLibrary("c_pq", IvfPqIndexer, docs, overwrite = true)
    // sanity: the intact codebook loads
    PqIndex.codebookOf(catalog.codebookTable("c_pq").get)
    // drop half the codebook rows on disk (a torn write / bad copy)
    val m = catalog.readMeta("c_pq").get
    val cbDir = libFile("c_pq", f"v${m.version}%06d", "codebook").toFile
    val holed = catalog.codebookTable("c_pq").get.where(col("j") < 8)
    val tmp = Files.createTempDirectory("pqhole").toString
    holed.coalesce(1).write.mode("overwrite").parquet(tmp)
    org.apache.commons.io.FileUtils.deleteDirectory(cbDir)
    org.apache.commons.io.FileUtils.copyDirectory(new java.io.File(tmp), cbDir)
    val e = intercept[IllegalArgumentException](
      PqIndex.codebookOf(catalog.codebookTable("c_pq").get))
    assert(e.getMessage.contains("missing entry"), e.getMessage)
  }

  test("a failed create does not leak its claim: the immediate retry succeeds") {
    // IvfPq needs >= 16 sample rows — a 3-row corpus throws during
    // buildIndex, AFTER the version claim; the claim must be cleaned up
    // or the name is locked out of writes for 15 minutes
    val tiny = spark.range(3).select(
      concat(lit("t"), col("id")).as("id"),
      lit("d0").as("document_id"),
      concat(lit("too few rows "), col("id")).as("text"))
    intercept[IllegalArgumentException](
      catalog.createLibrary("c_claim", IvfPqIndexer, tiny, overwrite = true))
    // immediate retry with a viable corpus must not hit a stale claim
    catalog.createLibrary("c_claim", IvfPqIndexer, corpus(), overwrite = true)
    assert(catalog.chunks("c_claim").count() === 20L)
  }

  test("invalid library names and tags are rejected loudly before touching disk") {
    intercept[IllegalArgumentException](
      catalog.createLibrary("""bad"name""", FlatIndexer, corpus()))
    intercept[IllegalArgumentException](
      catalog.createLibrary("../escape", FlatIndexer, corpus()))
    intercept[IllegalArgumentException](
      catalog.createLibrary("a/b", FlatIndexer, corpus()))
    mkLib("c_tags")
    intercept[IllegalArgumentException](
      catalog.updateLibrary("c_tags", newTags = Some(Seq("""has"quote"""))))
  }

  test("manifest referencing a deleted chunk leaf fails naming the missing path") {
    mkLib("c_leaf")
    val leaf = libFile("c_leaf", "v000000", "chunks", "__b=0")
    assert(Files.exists(leaf), "expected bucket 0 leaf dir")
    org.apache.commons.io.FileUtils.deleteDirectory(leaf.toFile)
    val e = intercept[Exception](catalog.chunks("c_leaf").count())
    val msg = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msg.contains("__b=0") || msg.toLowerCase.contains("does not exist")
      || msg.contains("PATH_NOT_FOUND"), s"unclear error: $msg")
  }
}
