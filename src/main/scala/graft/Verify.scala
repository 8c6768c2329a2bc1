package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional 3rd arg: comma-separated query names (dev inner loop);
    // the driver always calls with exactly (sfDir, outDir)
    val (sfDir, outDir, only) = args match {
      case Array(a, b)    => (a, b, Option.empty[Set[String]])
      case Array(a, b, c) => (a, b, Some(c.split(",").toSet))
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
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
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try {
        // Dump-layer canonicalization: order-free queries get sorted here
        // (mirroring their oracle's ORDER BY) so the hash compare is
        // deterministic without paying a global sort inside the query
        // itself — see SparkEntry.verifyOrder.
        val df = fn(spark, sfDir)
        val ordered = SparkEntry.verifyOrder.get(name) match {
          case Some(cols) => df.orderBy(cols.map(df(_)): _*)
          case None       => df
        }
        ordered.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
