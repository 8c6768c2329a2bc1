package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared test harness: one lazily-created local SparkSession reused by
  * every suite (session startup dominates test wall-time otherwise).
  * Config mirrors Verify/Bench: UTC, small shuffle partitions, nanos
  * timestamps readable (events.parquet is TIMESTAMP(NANOS)).
  */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
  /** sf0.001 testdata dir (500 embeddings / 500 documents / 6k lineitem). */
  val sfDir = "/root/testdata/sf0.001"
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession
      .builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // v2 commit: task files rename straight into the output dir (one
      // fs op instead of two per file) — the write paths here commit
      // many small parquet tables, and commit latency, not bandwidth,
      // dominates them
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      // local-mode IO floor: RawLocalFileSystem skips the .crc sibling
      // write per file (a real cluster fs has its own integrity story)
      .config("spark.hadoop.fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
      // a 100+-query surface compiles several codegen classes per query;
      // the default 100-entry class cache thrashes and recompiles every
      // re-execution (static conf, must be set before session build)
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      // bytes-sized small reduce sides (see Bench.scala for rationale)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false")
      .appName("graft-test")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
