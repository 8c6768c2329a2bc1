package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll

import graft.catalog.LibraryCatalog
import graft.catalog.LibraryCatalog._
import graft.catalog.Models._

/** [[LibraryCatalog.applyBatch]] semantics: a batch of mutations in one
  * commit must be BITWISE equivalent to applying the same mutations
  * sequentially — including the ordering rules (an op's predicate sees
  * earlier ops' effects; a deleted chunk cannot be matched later) and the
  * index side (tombstones + appends reconcile to the sequential state).
  */
class BatchMutationSpec extends SparkSpec with BeforeAndAfterAll {

  private lazy val warehouse =
    Files.createTempDirectory("graft-batch-").toString
  private lazy val catalog = new LibraryCatalog(spark, warehouse)

  override def afterAll(): Unit = {
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(warehouse))
    super.afterAll()
  }

  private def corpus(): DataFrame =
    spark.range(60).select(
      concat(lit("c"), col("id")).as("id"),
      concat(lit("d"), pmod(col("id"), lit(6))).as("document_id"),
      concat(lit("batch spec chunk number "), col("id")).as("text"),
      struct(
        lit("orig").as("source"),
        lit(null).cast("timestamp").as("created_at"),
        array(lit("orig")).as("tags"),
        lit(null).cast("string").as("author"),
        lit(null).cast("string").as("title"),
        lit(null).cast("string").as("description"),
        pmod(col("id"), lit(4)).cast("int").as("page")).as("metadata"))

  private val relabel = struct(
    lit("relabeled").as("source"),
    lit(null).cast("timestamp").as("created_at"),
    array(lit("relabeled")).as("tags"),
    lit(null).cast("string").as("author"),
    lit(null).cast("string").as("title"),
    lit(null).cast("string").as("description"),
    lit(null).cast("int").as("page"))

  private val ops = Seq(
    UpdateChunkOp("c5", newText = Some("rewritten text for chunk five")),
    UpdateMetadataWhereOp(col("document_id") === "d2", relabel),
    DeleteDocumentOp("d4"),
    DeleteChunksOp(Seq("c0", "c6")))

  /** Canonical sorted snapshot of a library's chunks (created_at dropped:
    * it is ingest-time-dependent across the two libraries). */
  private def snapshot(name: String): Array[String] =
    catalog.chunks(name)
      .select(col("id"), col("document_id"), col("text"), col("embedding"),
        col("metadata").dropFields("created_at").as("m"))
      .orderBy("id")
      .collect()
      .map(_.toString)

  private def indexSnapshot(name: String): Array[String] =
    catalog.indexTable(name).get
      .select("id", "table_idx", "sig")
      .orderBy("id", "table_idx", "sig")
      .collect()
      .map(_.toString)

  test("applyBatch == sequential application, chunks and index bitwise") {
    catalog.createLibrary("b_seq", LshIndexer, corpus(), overwrite = true)
    catalog.createLibrary("b_bat", LshIndexer, corpus(), overwrite = true)

    val mSeq = ops.foldLeft(catalog.readMeta("b_seq").get) { (_, op) =>
      op match {
        case UpdateChunkOp(id, t, md)     => catalog.updateChunk("b_seq", id, t, md)
        case UpdateMetadataWhereOp(p, nm) => catalog.updateMetadataWhere("b_seq", p, nm)
        case DeleteChunksOp(ids)          => catalog.deleteChunks("b_seq", ids)
        case DeleteChunksWhereOp(p)       => catalog.deleteChunksWhere("b_seq", p)
        case DeleteDocumentOp(d)          => catalog.deleteDocument("b_seq", d)
      }
    }
    val mBat = catalog.applyBatch("b_bat", ops)

    assert(snapshot("b_seq") === snapshot("b_bat"))
    assert(indexSnapshot("b_seq") === indexSnapshot("b_bat"))
    // one commit for the whole batch vs one per op
    assert(mBat.version === 1L)
    assert(mSeq.version === ops.size.toLong)
  }

  test("an op's predicate sees earlier ops' effects in the same batch") {
    catalog.createLibrary("b_chain", FlatIndexer, corpus(), overwrite = true)
    catalog.applyBatch("b_chain", Seq(
      UpdateMetadataWhereOp(col("id") === "c7", relabel),
      // matches ONLY because the previous op just relabeled c7
      DeleteChunksWhereOp(col("metadata.source") === "relabeled")))
    val left = catalog.chunks("b_chain")
    assert(left.where(col("id") === "c7").count() === 0L)
    assert(left.count() === 59L)
  }

  test("a chunk deleted earlier in the batch cannot be matched later (404)") {
    catalog.createLibrary("b_dead", FlatIndexer, corpus(), overwrite = true)
    val before = catalog.readMeta("b_dead").get.version
    val e = intercept[NoSuchElementException](
      catalog.applyBatch("b_dead", Seq(
        DeleteChunksOp(Seq("c3")),
        UpdateChunkOp("c3", newText = Some("too late")))))
    assert(e.getMessage.contains("c3"))
    // the failed batch published nothing
    assert(catalog.readMeta("b_dead").get.version === before)
    assert(catalog.chunks("b_dead").count() === 60L)
  }

  private def extras(): DataFrame =
    spark.range(8).select(
      concat(lit("x"), col("id")).as("id"),
      lit("dx").as("document_id"),
      concat(lit("added batch chunk "), col("id")).as("text"),
      struct(
        lit("added").as("source"),
        lit(null).cast("timestamp").as("created_at"),
        array(lit("added")).as("tags"),
        lit(null).cast("string").as("author"),
        lit(null).cast("string").as("title"),
        lit(null).cast("string").as("description"),
        lit(null).cast("int").as("page")).as("metadata"))

  test("batch with AddChunksOp == sequential, chunks and index bitwise") {
    val ops = Seq(
      DeleteChunksWhereOp(col("metadata.page") === 1),
      AddChunksOp(extras()),
      // matches ONLY the rows the previous op just added
      UpdateMetadataWhereOp(col("document_id") === "dx", relabel))
    catalog.createLibrary("b_aseq", LshIndexer, corpus(), overwrite = true)
    catalog.createLibrary("b_abat", LshIndexer, corpus(), overwrite = true)
    val mSeq = ops.foldLeft(catalog.readMeta("b_aseq").get) { (_, op) =>
      op match {
        case DeleteChunksWhereOp(p)       => catalog.deleteChunksWhere("b_aseq", p)
        case AddChunksOp(rows)            => catalog.addChunks("b_aseq", rows)
        case UpdateMetadataWhereOp(p, nm) => catalog.updateMetadataWhere("b_aseq", p, nm)
        case _                            => fail("unexpected op")
      }
    }
    val mBat = catalog.applyBatch("b_abat", ops)
    assert(snapshot("b_aseq") === snapshot("b_abat"))
    assert(indexSnapshot("b_aseq") === indexSnapshot("b_abat"))
    assert(mBat.version === 1L)
    assert(mSeq.version === 3L)
    // the relabel reached the added rows (sequential visibility)
    assert(catalog.chunks("b_abat")
      .where(col("metadata.source") === "relabeled").count() === 8L)
  }

  test("an add is visible to a later delete and invisible to an earlier one") {
    // delete-before-add: the predicate would match every added row but
    // runs first, so all 8 survive
    catalog.createLibrary("b_aord", FlatIndexer, corpus(), overwrite = true)
    catalog.applyBatch("b_aord", Seq(
      DeleteChunksWhereOp(col("metadata.source") === "added"),
      AddChunksOp(extras())))
    assert(catalog.chunks("b_aord")
      .where(col("document_id") === "dx").count() === 8L)
    // add-before-delete: the added row is gone from chunks AND the
    // logical index (never indexed; its tombstone is a no-op)
    catalog.createLibrary("b_aord2", LshIndexer, corpus(), overwrite = true)
    catalog.applyBatch("b_aord2", Seq(
      AddChunksOp(extras()),
      DeleteChunksWhereOp(col("id") === "x3")))
    val left = catalog.chunks("b_aord2")
    assert(left.where(col("id") === "x3").count() === 0L)
    assert(left.where(col("document_id") === "dx").count() === 7L)
    assert(catalog.indexTable("b_aord2").get
      .where(col("id") === "x3").count() === 0L)
    assert(catalog.indexTable("b_aord2").get
      .where(col("id") === "x5").count() > 0L)
  }

  test("an add-only batch on an HNSW library invalidates the persisted graph (adds are never metadata-only)") {
    import spark.implicits._
    catalog.createLibrary("b_hnsw_add", HnswIndexer, corpus(), overwrite = true)
    catalog.rebuildIndex("b_hnsw_add") // persists hnsw_graph/hnsw_meta
    assert(catalog.loadPersistedHnsw("b_hnsw_add").isDefined)
    // HNSW has no incremental index rows, so the artifact op is
    // CarryArtifacts — but the ROWS changed, so the stale graph must be
    // dropped, or the added chunk would be invisible to every search
    // until an unrelated rebuild
    val add = Seq(("bh-new", "d0", "hnsw batch add visibility fixture"))
      .toDF("id", "document_id", "text")
    catalog.applyBatch("b_hnsw_add", Seq(AddChunksOp(add)))
    assert(catalog.loadPersistedHnsw("b_hnsw_add").isEmpty,
      "add-only batch carried the stale persisted graph forward")
    val hit = catalog
      .search("b_hnsw_add", "hnsw batch add visibility fixture", k = 1)
      .head()
    assert(hit.getAs[String]("id") === "bh-new",
      "added chunk invisible to HNSW search after applyBatch")
  }

  test("minted ids are identical in the chunk table and the index (the delta lineage is pinned)") {
    // rows arrive WITHOUT ids across many partitions: normalize mints
    // uuid()s, and the chunk write + index-row write each evaluate the
    // delta — unpinned, the two jobs can mint DIFFERENT ids (uuid is
    // partition-layout-dependent) and the index would reference phantom
    // ids, leaving the rows silently unsearchable through the probe
    catalog.createLibrary("b_mint", LshIndexer, corpus(), overwrite = true)
    val noIds = spark.range(64).repartition(8).select(
      concat(lit("d"), pmod(col("id"), lit(4))).as("document_id"),
      concat(lit("minted id fixture chunk "), col("id")).as("text"))
    catalog.addChunks("b_mint", noIds)
    val chunkIds = catalog.chunks("b_mint")
      .select("id").collect().map(_.getString(0)).toSet
    val indexIds = catalog.indexTable("b_mint").get
      .select("id").collect().map(_.getString(0)).toSet
    assert(indexIds.subsetOf(chunkIds),
      s"index references ${(indexIds -- chunkIds).size} phantom ids " +
        "that exist in no chunk row")
    // and every ADDED row is indexed (64 new + 60 original)
    assert(indexIds.size === chunkIds.size,
      s"index covers ${indexIds.size} of ${chunkIds.size} chunks")
  }

  test("update paths enforce the ingest invariants (blank text, bad metadata fail loudly)") {
    catalog.createLibrary("b_valid", FlatIndexer, corpus(), overwrite = true)
    val blank = intercept[IllegalArgumentException] {
      catalog.updateChunk("b_valid", "c1", newText = Some("   "))
    }
    assert(blank.getMessage.contains("text cannot be blank"))
    val badPage = intercept[Exception] {
      catalog.updateChunk("b_valid", "c1", newMetadata = Some(struct(
        lit("s").as("source"),
        lit(null).cast("timestamp").as("created_at"),
        array(lit("t")).as("tags"),
        lit(null).cast("string").as("author"),
        lit(null).cast("string").as("title"),
        lit(null).cast("string").as("description"),
        lit(-1).as("page"))))
    }
    def msgs(t: Throwable): String = Iterator.iterate(t)(_.getCause)
      .takeWhile(_ != null).map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs(badPage).contains("page must be non-negative"), msgs(badPage))
    // and the trimmed update embeds like ingest would: same text, same
    // embedding whether it arrived by create or by update
    catalog.updateChunk("b_valid", "c1", newText = Some("  padded update text  "))
    val row = catalog.chunks("b_valid").where(col("id") === "c1")
      .select("text").head()
    assert(row.getString(0) === "padded update text",
      "update did not trim like ingest")
  }

  test("a batch matching nothing commits no new version") {
    catalog.createLibrary("b_noop", FlatIndexer, corpus(), overwrite = true)
    val before = catalog.readMeta("b_noop").get.version
    val after = catalog.applyBatch("b_noop",
      Seq(DeleteChunksWhereOp(col("metadata.source") === "nope")))
    assert(after.version === before)
  }
}
