package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryListener, Trigger}
import org.apache.spark.sql.types._

/** Decomposes q_stream_watermark's time: per micro-batch durationMs
  * breakdown (triggerExecution / addBatch / getBatch / walCommit /
  * commitOffsets / queryPlanning / stateStore) from the streaming
  * progress events, plus wall per phase (stage copy, run1, run2, read).
  * The query body mirrors SparkEntry's q_stream_watermark exactly.
  *
  * Usage: runMain graft.tools.StreamWmProfile [sfDir] [iters]
  */
object StreamWmProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val iters = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .config("spark.hadoop.fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false")
      .appName("stream-wm-profile").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // fixture dirs as SparkEntry builds them (find the bench's cache dir
    // by prefix — cachePath appends a CacheVersion and data stamp)
    val slug = dir.replaceAll("[^a-zA-Z0-9]", "_")
    val base = Option(new java.io.File(System.getProperty("java.io.tmpdir"))
        .listFiles()).getOrElse(Array.empty[java.io.File])
      .filter(f => f.getName.startsWith("graft_stream_wm_") &&
        f.getName.contains(slug) && new java.io.File(f, "_built").exists())
      .map(_.toString).headOption
      .getOrElse(sys.error(s"no built stream_wm fixture for $dir — run the bench once first"))
    println(s"[wmprof] fixture base=$base")

    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("ts_us", LongType),
      StructField("event_type", StringType), StructField("value", DoubleType)))

    val parts = if (args.length > 2) args(2).split(",").map(_.toInt).toSeq else Seq(8)
    (1 to iters).foreach { it =>
      val ss = spark.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", parts((it - 1) % parts.size))
      ss.streams.addListener(new StreamingQueryListener {
        override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
        override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
        override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
          val p = e.progress
          println(s"[batch] it=$it batch=${p.batchId} rows=${p.numInputRows} " +
            s"durations=${p.durationMs}")
        }
      })
      def tempDir(p: String): java.io.File = {
        val f = java.nio.file.Files.createTempDirectory(p).toFile; f
      }
      val inDir = tempDir("wmprof_in")
      val ckpt = tempDir("wmprof_ck").toString
      val outDir = tempDir("wmprof_out").toString
      def stage(src: String, prefix: String): Unit =
        new java.io.File(src).listFiles()
          .filter(f => f.isFile && !f.getName.startsWith(".") && !f.getName.startsWith("_"))
          .foreach(f => java.nio.file.Files.copy(f.toPath,
            new java.io.File(inDir, s"$prefix-${f.getName}").toPath))
      def drain(runName: String): Unit = {
        val t0 = System.nanoTime()
        val q = graft.streaming.StreamingIngest.eventsHourly(
            ss.readStream.format("graft-jsonl").schema(schema)
              .load(inDir.toString)
              .select(timestamp_micros(col("ts_us")).as("ts"),
                col("event_type"), col("value")),
            watermark = "2 hours")
          .writeStream.format("parquet")
          .option("path", outDir)
          .option("checkpointLocation", ckpt)
          .outputMode("append")
          .trigger(Trigger.AvailableNow())
          .start()
        try { q.awaitTermination(300000); () } finally q.stop()
        println(f"[wmprof] it=$it $runName wall=${(System.nanoTime()-t0)/1e9}%.3f s")
      }
      val t0 = System.nanoTime()
      stage(s"$base/ontime", "a")
      drain("run1")
      stage(s"$base/late", "b")
      drain("run2")
      val n = spark.read.parquet(outDir).count()
      println(f"[wmprof] it=$it total=${(System.nanoTime()-t0)/1e9}%.3f s rows=$n " +
        s"inFiles=${new java.io.File(inDir.toString).listFiles().length}")
    }
    spark.stop()
  }
}
