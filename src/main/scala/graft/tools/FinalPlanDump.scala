package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dumps the FINAL adaptive plan (post-execution, with ReusedExchange /
  * QueryStage structure) of named queries — the static
  * `explain("formatted")` shows per-side duplication that AQE dedupes at
  * runtime, so "what actually re-executes" is only readable here (the
  * round-16 ReuseProbe lesson). Executes each query via `collect()` on
  * its own QueryExecution (a noop write plans a separate one).
  *
  * Usage: runMain graft.tools.FinalPlanDump <q1,q2,...> [sfDir] [outDir]
  */
object FinalPlanDump {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: FinalPlanDump <q1,q2,...> [sfDir] [outDir]")
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val out = if (args.length > 2) args(2) else "/tmp/final_plans"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .config("spark.hadoop.fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false")
      .appName("final-plan-dump").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(out))
    val all = graft.SparkEntry.queries ++ graft.SparkEntry.benchOnlyQueries
    names.foreach { n =>
      try {
        val df = all(n)(spark, dir)
        val rows = df.collect().length
        // count within the FINAL plan section only — AdaptiveSparkPlanExec
        // appends "== Initial Plan ==" (the pre-AQE shape) after it, which
        // double-counts every operator if left in
        val s = df.queryExecution.executedPlan.toString
          .split("== Initial Plan ==")(0)
        def c(p: String) = p.r.findAllIn(s).size
        println(f"== $n%-28s rows=$rows%6d reused=${c("ReusedExchange")}%2d " +
          f"sort=${c("\\) Sort \\[")}%2d window=${c("Window \\[")}%2d " +
          f"hashAgg=${c("HashAggregate")}%2d objAgg=${c("ObjectHashAggregate")}%2d " +
          f"smj=${c("SortMergeJoin")}%2d shj=${c("ShuffledHashJoin")}%2d " +
          f"bhj=${c("BroadcastHashJoin")}%2d exch=${c("Exchange hashpartitioning")}%2d")
        Files.write(Paths.get(s"$out/$n.txt"), s.getBytes("UTF-8"))
      } catch {
        case e: Throwable => println(s"== $n FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
