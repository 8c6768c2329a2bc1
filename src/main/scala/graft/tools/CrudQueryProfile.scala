package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: the EXACT q_crud_pipeline body with a wall-clock per
  * phase, run three times in one session (bench-style min-of-N), so a
  * warm-vs-cold or state-shape regression shows up per phase instead of
  * as one opaque total. Run with
  * `runMain graft.tools.CrudQueryProfile [sfDir]`. */
object CrudQueryProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      // local-mode IO floor: RawLocalFileSystem skips the .crc sibling
      // write per file (a real cluster fs has its own integrity story)
      .config("spark.hadoop.fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
      // a 100+-query surface compiles several codegen classes per query;
      // the default 100-entry class cache thrashes and recompiles every
      // re-execution (static conf, must be set before session build)
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.catalog.{LibraryCatalog, Models}

    // listener accounting: per-job wall (end - start), to contrast phase
    // wall against executor job time and expose driver-side overhead
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val jobDur = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val stageLog = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobStart.put(e.jobId, e.time)
        override def onJobEnd(
            e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
          Option(jobStart.get(e.jobId)).foreach(s =>
            jobDur.put(e.jobId, e.time - s))
        override def onStageCompleted(
            e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val i = e.stageInfo
          val dur = for {
            s <- i.submissionTime; c <- i.completionTime
          } yield c - s
          stageLog.add(
            f"[stage] id=${i.stageId}%4d tasks=${i.numTasks}%3d " +
              f"dur=${dur.getOrElse(-1L) / 1e3}%.3f s  ${i.name.takeWhile(_ != '(')}")
        }
      })
    def phase[T](run: Int, name: String)(f: => T): T = {
      val beforeIds = new java.util.HashSet(jobStart.keySet())
      val t0 = System.nanoTime()
      val r = f
      val wall = (System.nanoTime() - t0) / 1e9
      // deterministic drain — a fixed sleep silently dropped late events
      // from the per-phase attribution (the very overhead being profiled)
      org.apache.spark.graft.ListenerBridge.waitForListenerBus(spark.sparkContext)
      val newIds = new java.util.HashSet(jobStart.keySet())
      newIds.removeAll(beforeIds)
      val it = newIds.iterator()
      var n = 0; var sum = 0L
      while (it.hasNext) {
        val id = it.next(); n += 1
        Option(jobDur.get(id)).foreach(sum += _)
      }
      println(f"[qprof] run$run $name%-24s $wall%.3f s  (jobs $n%2d, job-time ${sum / 1e3}%.3f s)")
      if (run == 3) {
        while (!stageLog.isEmpty) println(stageLog.poll())
      } else stageLog.clear()
      r
    }

    val wh = s"/tmp/qprof_${System.nanoTime()}"
    (1 to 3).foreach { run =>
      val cat = new LibraryCatalog(spark, wh)
      val src = spark.read.parquet(s"$dir/documents.parquet").select(
        concat(lit("c"), col("doc_id")).as("id"),
        concat(lit("d"), pmod(col("doc_id"), lit(50))).as("document_id"),
        col("text"),
        struct(
          col("lang").as("source"),
          lit(null).cast("timestamp").as("created_at"),
          array(col("lang")).as("tags"),
          lit(null).cast("string").as("author"),
          lit(null).cast("string").as("title"),
          lit(null).cast("string").as("description"),
          pmod(col("doc_id"), lit(10)).cast("int").as("page")).as("metadata"))
      phase(run, "createLibrary") {
        cat.createLibrary("crud_demo", Models.LshIndexer, src, overwrite = true)
      }
      val extra = spark.range(100).select(
        concat(lit("add"), col("id")).as("id"),
        lit("dadd").as("document_id"),
        concat(lit("synthetic chunk number "), col("id")).as("text"),
        struct(
          lit("synthetic").as("source"),
          lit(null).cast("timestamp").as("created_at"),
          array(lit("synthetic")).as("tags"),
          lit(null).cast("string").as("author"),
          lit(null).cast("string").as("title"),
          lit(null).cast("string").as("description"),
          lit(null).cast("int").as("page")).as("metadata"))
      phase(run, "batch(delete+add)") {
        cat.applyBatch("crud_demo", Seq(
          LibraryCatalog.DeleteChunksWhereOp(col("metadata.page") === 3),
          LibraryCatalog.AddChunksOp(extra)))
      }
      // mirrors the query's overlapped per-side digest: incremental
      // side scans concurrently with the rebuild on a cloned AQE-off
      // session; only the rebuilt side's scan runs after
      val digestSession = spark.newSession()
      digestSession.conf.set("spark.sql.adaptive.enabled", "false")
      digestSession.conf.set("spark.sql.files.minPartitionNum", "1")
      digestSession.conf.set("spark.sql.files.openCostInBytes",
        (64L * 1024).toString)
      def sideDigest(df: org.apache.spark.sql.DataFrame) = df
        .agg(
          coalesce(sum(xxhash64(col("id"), col("table_idx"), col("sig"))
            .cast("decimal(38,0)")), lit(java.math.BigDecimal.ZERO)).as("h"),
          count(lit(1)).as("n"))
        .head()
      val incSide = new LibraryCatalog(digestSession, wh)
        .indexTable("crud_demo").get.select("id", "table_idx", "sig")
      val incF = scala.concurrent.Future(sideDigest(incSide))(
        scala.concurrent.ExecutionContext.global)
      phase(run, "rebuildIndex")(cat.rebuildIndex("crud_demo"))
      phase(run, "digest") {
        val reb = sideDigest(new LibraryCatalog(digestSession, wh)
          .indexTable("crud_demo").get.select("id", "table_idx", "sig"))
        val inc = scala.concurrent.Await.result(
          incF, scala.concurrent.duration.Duration.Inf)
        assert(inc.getDecimal(0).compareTo(reb.getDecimal(0)) == 0 &&
          inc.getLong(1) == reb.getLong(1), "index digest mismatch")
      }
      phase(run, "batch(M4+M6+M7)") {
        cat.applyBatch("crud_demo", Seq(
          LibraryCatalog.UpdateChunkOp("add5",
            newText = Some("updated synthetic chunk number five")),
          LibraryCatalog.UpdateMetadataWhereOp(col("document_id") === "d7",
            struct(
              lit("relabeled").as("source"),
              lit(null).cast("timestamp").as("created_at"),
              array(lit("relabeled")).as("tags"),
              lit(null).cast("string").as("author"),
              lit(null).cast("string").as("title"),
              lit(null).cast("string").as("description"),
              lit(null).cast("int").as("page"))),
          LibraryCatalog.DeleteDocumentOp("d4")))
      }
      phase(run, "recover+aggregate") {
        new LibraryCatalog(spark, wh)
          .chunks("crud_demo")
          .groupBy(col("metadata.source").as("source"))
          .agg(count(lit(1)).as("n"), sum(length(col("text"))).as("sum_len"))
          .collect()
      }
    }
    spark.stop()
  }
}
