package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev micro-benchmark: the cost floor of the small single-task parquet
  * writes that dominate a small-library commit. Times a 5000-row
  * one-file write under (a) the default checksummed LocalFileSystem and
  * (b) RawLocalFileSystem (no .crc sibling files), plus a same-data
  * in-memory collect as the no-IO baseline. */
object WriteFloor {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = spark.range(5000).select(
      concat(lit("c"), col("id")).as("id"),
      concat(lit("synthetic chunk number "), col("id")).as("text"),
      graft.functions.Embedder.embed(concat(lit("synthetic chunk number "),
        col("id"))).as("embedding"))
      .coalesce(1)
    def time(name: String)(f: => Unit): Unit = {
      (1 to 5).foreach { i =>
        val t0 = System.nanoTime()
        f
        println(f"[floor] $name%-28s run$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    time("collect-baseline")(df.collect())
    time("write-default") {
      df.write.mode("overwrite").parquet(s"/tmp/wf_default")
    }
    spark.sparkContext.hadoopConfiguration.set(
      "fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
    time("write-rawlocal") {
      df.write.mode("overwrite").parquet(s"/tmp/wf_raw")
    }
    time("write-uncompressed") {
      df.write.mode("overwrite").option("compression", "none")
        .parquet(s"/tmp/wf_nocomp")
    }
    spark.stop()
  }
}
