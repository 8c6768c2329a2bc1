package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}

import graft.catalog.LibraryCatalog

/** Structured Streaming surface. The reference has NO streaming
  * (SURVEY.md §2.10) — its only asynchrony is background index rebuilds
  * (M10). This module is the beyond-parity streaming story a Spark
  * engine should have:
  *
  *  - [[eventsHourly]]: the streaming twin of the batch q_events_hourly
  *    — event-time windowed aggregation with a watermark bounding state.
  *  - [[sessionize]]: per-user custom state via flatMapGroupsWithState-
  *    style session windows (built-in session_window keeps it codegen'd).
  *  - [[ingestInto]]: streaming library ingest — foreachBatch appends
  *    each micro-batch to a catalog library through the SAME
  *    `addChunks` path batch uses, so the LSH signature table is
  *    maintained incrementally per batch and every consistency rule
  *    (normalization, dedup-before-embed, version swap) holds for
  *    streamed data too. This is the Spark-native replacement for the
  *    reference's background-task + lock machinery
  *    (`background_tasks.py:4-17`): micro-batch boundaries ARE the
  *    serialization points, and the version swap keeps readers
  *    consistent without locks.
  *
  * At scale: watermarks bound state stores; the ingest path writes one
  * parquet version per micro-batch (tune the trigger to amortize), and
  * compaction is the existing catalog GC.
  */
object StreamingIngest {

  /** Hourly event-time rollup with late-data tolerance. Input schema
    * must contain (ts TIMESTAMP, event_type STRING, value DOUBLE). */
  def eventsHourly(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .select(
        col("window.start").as("hour_start"),
        col("event_type"), col("n"), col("sum_value"))

  /** Per-user session windows (30 min gap): custom sessionization state
    * handled by the built-in session_window (stays in codegen; reach for
    * flatMapGroupsWithState only when per-group logic can't be expressed
    * declaratively). */
  def sessionize(
      events: DataFrame,
      gap: String = "30 minutes",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"), sum("value").as("session_value"))
      .select(
        col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("session_value"))

  /** Streaming ingest into a catalog library: each micro-batch flows
    * through the exact batch `addChunks` path (normalize → embed →
    * union → incremental index → version swap). Returns the writer so
    * the caller picks the trigger/checkpoint.
    *
    * foreachBatch is AT-LEAST-ONCE: a crash between the catalog commit
    * and the streaming checkpoint commit replays the batch. The applied
    * batchId is therefore recorded (per `sourceId`) in the library dir
    * right after each commit, and replayed batches ≤ the recorded id
    * are skipped — idempotent ingest up to the ms-scale window between
    * the two driver writes (a duplicate there requires dying exactly
    * between them; exactly-once would need the marker transactional
    * with the commit itself).
    *
    * `sourceId` MUST be unique per logical stream — batch ids are
    * per-CHECKPOINT, so reusing a sourceId with a fresh checkpoint
    * would misread the new stream's early batch ids as replays and
    * silently drop them (derive it from the checkpoint location, as
    * [[runOnce]] does). */
  def ingestInto(
      catalog: LibraryCatalog,
      library: String,
      chunks: DataFrame,
      sourceId: String = "default"): DataStreamWriter[org.apache.spark.sql.Row] =
    chunks.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        // the batch plan re-executes per action — persist it so the
        // emptiness probe and addChunks' ingest don't each re-pay the
        // upstream source work
        val cached = batch.persist()
        try {
          if (!cached.isEmpty &&
              catalog.lastIngestedBatch(library, sourceId).forall(_ < batchId)) {
            catalog.addChunks(library, cached.toDF())
            catalog.recordIngestedBatch(library, sourceId, batchId)
          }
        } finally cached.unpersist()
        ()
      }

  /** Convenience: run a bounded ingest of `chunks` with a processing-
    * time trigger until the stream is drained (used by tests/demos). */
  def runOnce(
      catalog: LibraryCatalog,
      library: String,
      chunks: DataFrame,
      checkpoint: String): Unit = {
    // marker keyed by the CHECKPOINT (batch ids are per-checkpoint):
    // resuming this checkpoint skips replays, a different checkpoint
    // gets its own marker and never mistakes batch 0 for a replay.
    // Full 128-bit digest — a 32-bit hash of the path would collide at
    // birthday scale across many checkpoints, and a collision makes the
    // newer stream's early batches look like replays (silently dropped).
    // The derivation is the SHARED Md5Expressions.hexDigestUtf8 — this
    // id is persistence-critical, and a second hand-rolled copy that
    // silently diverged (charset, hex case) would re-key every
    // checkpoint's marker.
    val sourceId = "ck" + graft.functions.Md5Expressions.hexDigestUtf8(checkpoint)
    // migration: this id was previously derived from a 32-bit murmur of
    // the checkpoint path ("ck" + up to 8 hex). A warehouse whose last
    // marker predates the md5 derivation would look never-ingested under
    // the new id, and a restart inside foreachBatch's at-least-once
    // replay window would RE-INGEST the duplicate batch the marker
    // exists to prevent. Carry the legacy marker forward once; the next
    // recordIngestedBatch keeps the new name current. Residual risk,
    // accepted and bounded: a BRAND-NEW checkpoint whose murmur32
    // collides with some legacy-era marker (p = 2^-32 per legacy
    // marker, only until this library's first recordIngestedBatch
    // writes the md5 name) would inherit that marker's batch id and
    // skip its own early batches — the legacy namespace is frozen (no
    // new murmur markers are ever written), so the surface only
    // shrinks as libraries touch their md5 markers.
    if (catalog.lastIngestedBatch(library, sourceId).isEmpty) {
      val legacyId = "ck" + java.lang.Long.toHexString(
        scala.util.hashing.MurmurHash3.stringHash(checkpoint).toLong & 0xffffffffL)
      catalog.lastIngestedBatch(library, legacyId)
        .foreach(b => catalog.recordIngestedBatch(library, sourceId, b))
    }
    val q = ingestInto(catalog, library, chunks, sourceId)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Per-digest dedup state: id kept for the digest + how many times
    * the digest has been seen so far (across ALL batches). */
  case class DedupState(keptId: String, seen: Long)

  /** A kept (first-occurrence) document, keyed by its 128-bit text
    * digest (two longs). */
  case class KeptDoc(digestHi: Long, digestLo: Long, id: String)

  /** Streaming EXACT dedup with CROSS-BATCH state (keep-first): emits a
    * document only the first time its text appears anywhere in the
    * stream's history; later occurrences — same batch or any later
    * batch — are dropped. Grouping keys on the 128-BIT md5 DIGEST of
    * the text, not the text and not a 64-bit hash — both endpoints of
    * that spectrum fail at corpus scale: a 64-bit key silently drops a
    * distinct document on a birthday collision (an expectation at
    * billions of distinct texts, ~n²/2⁶⁵), while keying on the full
    * text makes the state store carry the distinct corpus TEXT — at
    * 100 TB the dedup state would BE the corpus. At 128 bits the
    * collision odds are ~n²/2¹²⁹ (≈4e-15 even at 10¹² distinct texts —
    * far below any hardware error rate) and every state row is
    * CONSTANT WIDTH: 16 bytes of key + the kept id + a count
    * (spec-pinned via the state-store data source). Expressed via
    * `flatMapGroupsWithState` because the state (kept id + running
    * duplicate count) is richer than a membership bit — the count is
    * observable offline through `spark.read.format("statestore")` over
    * the checkpoint for dup-rate monitoring.
    *
    * At scale: state is one (digest, id, count) entry per DISTINCT
    * text. Unbounded by design (dedup history must not expire); a
    * corpus-versioned restart is the compaction story. */
  def streamingDedup(
      docs: DataFrame, // streaming: (id STRING, text STRING)
      idCol: String = "id",
      textCol: String = "text"): Dataset[KeptDoc] = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, GroupState}
    import org.apache.spark.sql.graft.ColumnBridge
    val spark = docs.sparkSession
    import spark.implicits._
    // the digest computes ONCE per row in the scan projection (the fused
    // Md5Chunks kernel: one digest buffer → four 32-bit words), folded
    // into two longs — the 16-byte grouping key
    val chunks = ColumnBridge.column(graft.functions.Md5Chunks(
      ColumnBridge.expression(col(textCol).cast("binary"))))
    docs
      // NULL text is dropped BEFORE the digest (ingest-validation
      // parity: the batch path drops blank/null text, chunk.py:55-61).
      // Without the filter Md5Chunks propagates the null into the
      // non-nullable (String, Long, Long) encoder, which throws inside
      // the stream — and a failed batch replays identically on restart,
      // wedging the query permanently on one bad row.
      .where(col(textCol).isNotNull)
      .select(col(idCol).as("id"), chunks.as("__ch"))
      .select(
        col("id"),
        shiftleft(element_at(col("__ch"), 1), 32)
          .bitwiseOR(element_at(col("__ch"), 2)).as("hi"),
        shiftleft(element_at(col("__ch"), 3), 32)
          .bitwiseOR(element_at(col("__ch"), 4)).as("lo"))
      .as[(String, Long, Long)]
      .groupByKey(r => (r._2, r._3))
      .flatMapGroupsWithState[DedupState, KeptDoc](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        case ((hi, lo), rows, state: GroupState[DedupState]) =>
          // ONE streaming fold — a hot duplicate key (one text repeated
          // millions of times in a batch) must never buffer every
          // occurrence's id in memory; only min(id) and the count are
          // needed
          var n = 0L
          var minId: String = null
          rows.foreach { r =>
            n += 1
            // null-safe: a NULL id must neither win the fold nor NPE
            // the `<` (a wedged-forever stream); all-null groups keep
            // null, matching the nullable KeptDoc.id
            if (r._1 != null && (minId == null || r._1 < minId)) minId = r._1
          }
          val prev = state.getOption
          val kept = prev match {
            case Some(_) => Iterator.empty // text already admitted
            case None    => Iterator.single(KeptDoc(hi, lo, minId))
          }
          val keptId = prev.map(_.keptId).getOrElse(minId)
          state.update(DedupState(keptId, prev.map(_.seen).getOrElse(0L) + n))
          kept
      }
  }

  /** Streaming kNN: a stream of (qid, query vector) answered per
    * micro-batch against a STATIC corpus. Each batch runs the exact
    * batch kNN per query (broadcast query literal → codegen'd distance →
    * TakeOrderedAndProject), so streaming answers are identical to what
    * the batch path would return — the lambda-architecture property for
    * free. `sink` receives (qid, id, dist) rows per batch.
    *
    * At scale: per-batch query count is expected small (it's a serving
    * path); for bulk offline scoring use the batch
    * [[graft.operators.HnswIndex.searchPartitioned]] instead.
    *
    * Delivery contract: foreachBatch is AT-LEAST-ONCE — after a crash
    * between the sink call and the checkpoint commit the batch replays
    * and the sink sees the same results again. Every sinked row carries
    * `batch_id` so an appending sink can deduplicate replays on
    * (batch_id, qid); the ingest path in this file gets the same
    * property from its catalog markers. */
  def streamingKnn(
      queries: DataFrame, // streaming: (qid LONG, query ARRAY<FLOAT>)
      corpus: DataFrame, // static: (idCol, embCol)
      k: Int,
      idCol: String = "vec_id",
      embCol: String = "embedding")(
      sink: DataFrame => Unit): DataStreamWriter[org.apache.spark.sql.Row] =
    queries.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], bid: Long) =>
        val qs = batch
          .select(col("qid"), col("query"))
          // a NULL qid NPEs the primitive getLong and a NULL vector
          // reaches the distance kernel unchecked — either way the
          // batch fails, replays, and fails again forever; malformed
          // serving requests are dropped, never stream-killers
          .where(col("qid").isNotNull && col("query").isNotNull)
          .collect()
          .map(r => (r.getLong(0), r.getSeq[Float](1)))
        qs.foreach { case (qid, qv) =>
          sink(
            graft.operators.FlatKnn
              .search(corpus, qv, k, idCol = idCol, embCol = embCol)
              .withColumn("qid", lit(qid))
              .withColumn("batch_id", lit(bid)))
        }
        ()
      }
}
