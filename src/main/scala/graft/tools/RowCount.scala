package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: result-row counts for selected SparkEntry queries on a
  * given sf dir — the numbers SCALING.md's output-bound growth analysis
  * cites (`runMain graft.tools.RowCount <sfDir> <q1,q2,...>`). Counts,
  * not noop-sink timings: Catalyst may prune work under a count, so
  * these are row-cardinality measurements only, never a bench. */
object RowCount {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, names) = args
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.hadoop.fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.split(",").map(_.trim).filter(_.nonEmpty).foreach { n =>
      val t0 = System.nanoTime()
      val c = graft.SparkEntry.queries(n)(spark, sfDir).count()
      println(f"[rowcount] $n%-28s rows=$c%-12d (${(System.nanoTime() - t0) / 1e9}%.1f s)")
    }
    spark.stop()
  }
}
