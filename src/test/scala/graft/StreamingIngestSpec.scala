package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll

import graft.catalog.LibraryCatalog
import graft.catalog.Models.{HnswIndexer, LshIndexer}
import graft.streaming.StreamingIngest

/** Structured Streaming semantics: windowed aggregation with watermark,
  * session windows, and streaming library ingest through foreachBatch
  * with incremental index maintenance. */
class StreamingIngestSpec extends SparkSpec with BeforeAndAfterAll {

  private lazy val warehouse = Files.createTempDirectory("graft-stream-wh-").toString

  override def afterAll(): Unit = {
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(warehouse))
    super.afterAll()
  }

  private def ts(minute: Int) =
    java.sql.Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")

  test("eventsHourly: streaming windowed agg matches the batch rollup") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    mem.addData(
      (ts(5), "click", 1.0), (ts(10), "click", 2.0),
      (ts(20), "view", 5.0), (ts(59), "click", 4.0))
    val out = StreamingIngest
      .eventsHourly(mem.toDF().toDF("ts", "event_type", "value"))
    val q = out.writeStream
      .format("memory").queryName("hourly_out")
      .outputMode("complete")
      .start()
    try {
      q.processAllAvailable()
      val rows = spark.table("hourly_out").collect()
        .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n"), r.getAs[Double]("sum_value")))
        .toSet
      assert(rows === Set(("click", 3L, 7.0), ("view", 1L, 5.0)))
    } finally q.stop()
  }

  test("sessionize: 30-minute gap splits a user's events into sessions") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long, Double)]
    // user 1: events at 10:00 and 10:10 (one session), then 11:30 (new session)
    mem.addData(
      (ts(0), 1L, 1.0), (ts(10), 1L, 1.0),
      (java.sql.Timestamp.valueOf("2026-01-01 11:30:00"), 1L, 1.0))
    val out = StreamingIngest
      .sessionize(mem.toDF().toDF("ts", "user_id", "value"))
    val q = out.writeStream
      .format("memory").queryName("sessions_out")
      .outputMode("complete")
      .start()
    try {
      q.processAllAvailable()
      val sessions = spark.table("sessions_out").collect()
      assert(sessions.length === 2)
      assert(sessions.map(_.getAs[Long]("n_events")).sorted.toSeq === Seq(1L, 2L))
    } finally q.stop()
  }

  test("streaming ingest appends micro-batches through addChunks with incremental LSH") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val catalog = new LibraryCatalog(spark, warehouse)
    val seedDocs = spark.read
      .parquet(s"$sfDir/documents.parquet")
      .where(col("doc_id") < 10)
      .select(
        concat(lit("seed-"), col("doc_id")).as("id"),
        lit("doc-seed").as("document_id"),
        col("text"))
    catalog.createLibrary("stream_lib", LshIndexer, seedDocs, overwrite = true)
    assert(catalog.chunks("stream_lib").count() === 10L)

    val mem = MemoryStream[(String, String, String)]
    mem.addData(
      ("s-1", "doc-live", "first streamed chunk about shuffle tuning"),
      ("s-2", "doc-live", "second streamed chunk about broadcast joins"))
    val ckpt = Files.createTempDirectory("graft-ckpt-").toString
    StreamingIngest.runOnce(
      catalog, "stream_lib",
      mem.toDF().toDF("id", "document_id", "text"), ckpt)

    assert(catalog.chunks("stream_lib").count() === 12L)
    // incremental index maintenance: signature rows exist for streamed ids
    val sig = catalog.indexTable("stream_lib").get
    assert(sig.where(col("id") === "s-1").count() === 10L) // numTables rows
    // and the streamed chunk is searchable end-to-end
    val hit = catalog
      .search("stream_lib", "first streamed chunk about shuffle tuning", k = 1)
      .head()
    assert(hit.getAs[String]("id") === "s-1")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(ckpt))
  }

  test("streaming ingest into an hnsw library: graph artifact invalidates, search stays correct") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val catalog = new LibraryCatalog(spark, warehouse)
    val seedDocs = spark.read
      .parquet(s"$sfDir/documents.parquet")
      .where(col("doc_id") < 10)
      .select(
        concat(lit("hseed-"), col("doc_id")).as("id"),
        lit("doc-seed").as("document_id"),
        col("text"))
    catalog.createLibrary("stream_hnsw", HnswIndexer, seedDocs, overwrite = true)
    // create persisted the graph artifact
    assert(catalog.loadPersistedHnsw("stream_hnsw").isDefined)

    val mem = MemoryStream[(String, String, String)]
    mem.addData(
      ("hs-1", "doc-live", "streamed hnsw chunk about graph ingest"),
      ("hs-2", "doc-live", "streamed hnsw chunk about artifact turnover"))
    val ckpt = Files.createTempDirectory("graft-ckpt-").toString
    StreamingIngest.runOnce(
      catalog, "stream_hnsw",
      mem.toDF().toDF("id", "document_id", "text"), ckpt)

    assert(catalog.chunks("stream_hnsw").count() === 12L)
    // the micro-batch delta invalidated the persisted graph …
    assert(catalog.loadPersistedHnsw("stream_hnsw").isEmpty,
      "streamed delta left a stale persisted graph reachable")
    // … and the search path (lazy rebuild) sees the streamed rows
    val hit = catalog
      .search("stream_hnsw", "streamed hnsw chunk about graph ingest", k = 1)
      .head()
    assert(hit.getAs[String]("id") === "hs-1")
    // rebuildIndex re-persists; a fresh catalog then loads, not rebuilds
    catalog.rebuildIndex("stream_hnsw")
    assert(new LibraryCatalog(spark, warehouse)
      .loadPersistedHnsw("stream_hnsw").isDefined)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(ckpt))
  }

  test("ingest markers: distinct sourceIds never collide, and legacy-named markers are still honored") {
    import graft.catalog.Models
    import spark.implicits._
    val catalog = new LibraryCatalog(spark, warehouse)
    if (!catalog.exists("marker_lib"))
      catalog.createLibrary("marker_lib", Models.FlatIndexer,
        Seq(("m-1", "d-1", "marker fixture text")).toDF("id", "document_id", "text"))
    // the round-8 naming sanitized "a/b" and "a_b" to ONE filename —
    // two streams would read each other's batch ids and silently skip
    // real batches as replays; the injective name must separate them
    catalog.recordIngestedBatch("marker_lib", "a/b", 7L)
    assert(catalog.lastIngestedBatch("marker_lib", "a/b") === Some(7L))
    assert(catalog.lastIngestedBatch("marker_lib", "a_b") === None,
      "distinct sourceIds share a marker file")
    // migration: a marker written under the LEGACY name (bare sanitized
    // id) must still be read — otherwise the first post-upgrade restart
    // re-ingests a replayed batch, the exact duplicate markers prevent
    val legacy = new java.io.File(
      s"$warehouse/marker_lib/_ingest_topic.x-1")
    val w = new java.io.FileWriter(legacy)
    try w.write("41") finally w.close()
    assert(catalog.lastIngestedBatch("marker_lib", "topic.x-1") === Some(41L),
      "legacy marker invisible after upgrade")
    // a new-format write then shadows the legacy file
    catalog.recordIngestedBatch("marker_lib", "topic.x-1", 42L)
    assert(catalog.lastIngestedBatch("marker_lib", "topic.x-1") === Some(42L))
    // the legacy fallback is restricted to ids sanitizing rewrote
    // NOTHING of: a legacy `_ingest_x_y` file is shared by every raw id
    // that sanitizes to "x_y" ("x/y", "x:y", …), so a rewritten id must
    // NOT read it — one stream would consume another's batch id and
    // silently skip a real batch (the collision the injective naming
    // fixed would persist through the fallback window)
    val shared = new java.io.File(s"$warehouse/marker_lib/_ingest_x_y")
    val w2 = new java.io.FileWriter(shared)
    try w2.write("9") finally w2.close()
    assert(catalog.lastIngestedBatch("marker_lib", "x/y") === None,
      "rewritten sourceId read a shared legacy marker")
    assert(catalog.lastIngestedBatch("marker_lib", "x_y") === Some(9L),
      "identity-sanitized sourceId must still honor its legacy marker")
  }

  test("runOnce honors a pre-md5 (murmur-derived) checkpoint marker: no duplicate re-ingest after upgrade") {
    import graft.catalog.Models
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val catalog = new LibraryCatalog(spark, warehouse)
    catalog.createLibrary("murmur_lib", Models.FlatIndexer,
      Seq(("m-1", "d-1", "murmur fixture text")).toDF("id", "document_id", "text"),
      overwrite = true)
    val ckpt = Files.createTempDirectory("graft-murmur-ck-").toString
    // a warehouse written before the md5 sourceId derivation carries the
    // marker under "ck" + 8-hex murmur of the checkpoint path; a restart
    // inside foreachBatch's at-least-once replay window must still see it
    val legacyId = "ck" + java.lang.Long.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(ckpt).toLong & 0xffffffffL)
    catalog.recordIngestedBatch("murmur_lib", legacyId, 0L)
    val mem = MemoryStream[(String, String, String)]
    mem.addData(("mm-1", "doc-live", "replayed batch that must be skipped"))
    StreamingIngest.runOnce(
      catalog, "murmur_lib",
      mem.toDF().toDF("id", "document_id", "text"), ckpt)
    // batch 0 is a replay per the migrated marker — NOT re-ingested
    assert(catalog.chunks("murmur_lib").count() === 1L,
      "pre-upgrade replay marker ignored: duplicate batch re-ingested")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(ckpt))
  }

  test("streamingDedup survives NULL text and NULL ids (no wedged-forever batch)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("dedup_null_ck").toString
    val mem = MemoryStream[(String, String)]
    val deduped = StreamingIngest.streamingDedup(mem.toDF().toDF("id", "text"))
    val q = deduped.writeStream
      .format("memory").queryName("dedup_null_out").outputMode("append")
      .option("checkpointLocation", ckpt).start()
    try {
      // a NULL text row (dropped: ingest-validation parity) and a NULL
      // id duplicate (must lose the min-id fold, not NPE it) — before
      // the guards either row failed the batch, and a failed batch
      // replays identically on restart: a permanently wedged stream
      mem.addData((null, "kept text"), ("x-1", null), ("x-2", "kept text"))
      q.processAllAvailable()
      val rows = spark.table("dedup_null_out").collect()
      assert(rows.length === 1, "null text dropped; one distinct text kept")
      assert(rows.head.getAs[String]("id") === "x-2",
        "a NULL id must never win the min-id fold over a non-null one")
      mem.addData(("y-1", "fresh text"))
      q.processAllAvailable() // the stream is still alive and ingesting
      assert(spark.table("dedup_null_out").count() === 2)
    } finally q.stop()
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(ckpt))
  }

  test("streamingDedup keeps first occurrences only, across batches (flatMapGroupsWithState)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("dedup_ck").toString
    val mem = MemoryStream[(String, String)]
    val deduped = StreamingIngest.streamingDedup(mem.toDF().toDF("id", "text"))
    val q = deduped.writeStream
      .format("memory").queryName("dedup_out").outputMode("append")
      .option("checkpointLocation", ckpt).start()
    try {
      // batch 1: A, B, and an in-batch duplicate of A
      mem.addData(("a-1", "alpha text"), ("b-1", "beta text"), ("a-2", "alpha text"))
      q.processAllAvailable()
      val after1 = spark.table("dedup_out").collect()
        .map(r => r.getAs[String]("id")).sorted
      assert(after1 === Array("a-1", "b-1")) // min id kept for the dup group
      // batch 2: a CROSS-batch duplicate of A and a new doc C
      mem.addData(("a-3", "alpha text"), ("c-1", "gamma text"))
      q.processAllAvailable()
      val after2 = spark.table("dedup_out").collect()
        .map(r => r.getAs[String]("id")).sorted
      assert(after2 === Array("a-1", "b-1", "c-1"),
        "cross-batch duplicate must be dropped by the persistent state")
      // STATE ROW WIDTH IS CONSTANT: the store keys on the 128-bit
      // digest (two longs), never the text — at 100 TB a text-keyed
      // state store would carry the distinct corpus. Read the store
      // through the state-store data source and pin the schema + that
      // the digest maps back to exactly one kept id per distinct text.
      val state = spark.read.format("statestore").load(ckpt)
      val keyFields = state.schema("key").dataType
        .asInstanceOf[org.apache.spark.sql.types.StructType]
      assert(keyFields.fields.forall(_.dataType ==
        org.apache.spark.sql.types.LongType),
        s"state key must be digest longs, got $keyFields")
      assert(!keyFields.fieldNames.exists(_.toLowerCase.contains("text")),
        s"state key carries text: $keyFields")
      val rows = state.select("key.*", "value.groupState.*").collect()
      assert(rows.length === 3, "one state row per distinct text")
      val seenByKept = rows.map(r => (r.getAs[String]("keptId"), r.getAs[Long]("seen"))).toMap
      assert(seenByKept === Map("a-1" -> 3L, "b-1" -> 1L, "c-1" -> 1L),
        "running duplicate counts must accumulate across batches")
    } finally {
      q.stop()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
    }
  }

  test("streaming kNN answers match the batch path exactly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpus = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val q0 = corpus.where(col("vec_id") === 0).select("embedding").head().getSeq[Float](0)
    val q7 = corpus.where(col("vec_id") === 7).select("embedding").head().getSeq[Float](0)
    val mem = MemoryStream[(Long, Seq[Float])]
    mem.addData((0L, q0), (7L, q7))
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    val writer = StreamingIngest.streamingKnn(
      mem.toDF().toDF("qid", "query"), corpus, k = 5) { df =>
      got ++= df.collect().map(r =>
        (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"), r.getAs[Double]("dist")))
    }
    val q = writer.start()
    try q.processAllAvailable()
    finally q.stop()
    val byQ = got.groupBy(_._1)
    assert(byQ.keySet === Set(0L, 7L))
    Seq(0L -> q0, 7L -> q7).foreach { case (qid, qv) =>
      val batch = graft.operators.FlatKnn.search(corpus, qv, 5).collect()
        .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("dist")))
      assert(byQ(qid).map(t => (t._2, t._3)).sortBy(_._1) === batch.sortBy(_._1).toSeq)
    }
  }
}
