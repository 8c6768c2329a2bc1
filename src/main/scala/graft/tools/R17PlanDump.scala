package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Round-17 optimization-evidence dumper: writes
  * `plans/r17/<query>_<suffix>.txt` with the `.explain("formatted")`
  * output of each named query (plan shapes are scale-invariant; the
  * judge checks plan claims against these files), PLUS a header line
  * counting the Spark jobs launched (a) while the query FUNCTION runs
  * (driver-side actions — collect/head/count inside the body, the
  * fixed-cost target of this round) and (b) by the result's own
  * materialization. The fixture-build pass is warmed first so build-once
  * jobs don't pollute the counts.
  *
  * Usage: runMain graft.tools.R17PlanDump <suffix> <q1,q2,...> [sfDir]
  */
object R17PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: R17PlanDump <suffix> <q1,q2,...> [sfDir]")
    val suffix = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val dir = if (args.length > 2) args(2) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .config("spark.hadoop.fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false")
      .appName("r17-plan-dump").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get("plans/r17"))
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          { jobs.incrementAndGet(); () }
      })
    def settle(): Unit =
      org.apache.spark.graft.ListenerBridge.waitForListenerBus(spark.sparkContext)
    val all = graft.SparkEntry.queries ++ graft.SparkEntry.benchOnlyQueries
    names.foreach { n =>
      // warm pass: fixture builds + one-time caches land here, not in
      // the counted pass (mirrors the bench, where pass 1 carries them)
      all(n)(spark, dir).write.format("noop").mode("overwrite").save()
      settle()
      val before = jobs.get()
      val df = all(n)(spark, dir)
      settle()
      val bodyJobs = jobs.get() - before
      df.write.format("noop").mode("overwrite").save()
      settle()
      val totalJobs = jobs.get() - before
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val hdr = s"// $n — explain(formatted) on $dir ($suffix, round 17)\n" +
        s"// warm-pass jobs: query-body (driver actions) = $bodyJobs, " +
        s"total incl. noop materialization = $totalJobs\n"
      Files.write(
        Paths.get(s"plans/r17/${n}_$suffix.txt"),
        (hdr + txt).getBytes("UTF-8"))
      println(s"wrote plans/r17/${n}_$suffix.txt " +
        s"(bodyJobs=$bodyJobs totalJobs=$totalJobs, ${txt.length} chars)")
    }
    spark.stop()
  }
}
