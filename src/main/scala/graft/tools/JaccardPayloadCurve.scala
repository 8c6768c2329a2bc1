package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the JaccardJoin per-document prefix PAYLOAD curve — the
  * basis for [[graft.operators.JaccardJoin.DefaultMaxPrefixLen]]. Each
  * of a doc's P prefix rows carries its `pe` array (rn-1 hashes), so
  * the per-doc candidate-exchange payload is Sum(rn-1) ≈ 8·P²/2 bytes:
  * quadratic in the prefix length. This prints, for single synthetic
  * documents of growing shingle count, the realized prefix length, the
  * exact Sum(size(pe)) payload in MB, and the wall time to materialize
  * the prefix table — so the enforced knee is a measurement, not a
  * constant (SCALING.md records the curve). Usage:
  *   runMain graft.tools.JaccardPayloadCurve [s1,s2,...]
  */
object JaccardPayloadCurve {
  def main(args: Array[String]): Unit = {
    val sizes = (if (args.nonEmpty) args(0) else "1000,2000,4000,8000,16000,32000")
      .split(",").map(_.trim.toInt).toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .appName("jaccard-payload-curve")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    sizes.foreach { s =>
      // one document of s+2 distinct tokens → s distinct 3-shingles
      val text = (0 until s + 2).map(i => s"tok$i").mkString(" ")
      val df = Seq((0L, text)).toDF("doc_id", "text")
      val t0 = System.nanoTime()
      val row = graft.operators.JaccardJoin
        .prefixTable(df, "doc_id", "text", 3, 3, 5, maxPrefixLen = Int.MaxValue)
        .agg(
          count(lit(1)).as("prefix_len"),
          sum(size(col("pe"))).as("pe_hashes"))
        .head()
      val dt = (System.nanoTime() - t0) / 1e9
      val p = row.getLong(0)
      val mb = row.getLong(1) * 8.0 / 1e6
      // ROOT locale, like Bench's num() (comma-decimal JVM locales)
      println("shingles=%6d prefix=%6d pe_payload=%10.2f MB  wall=%6.2f s"
        .formatLocal(java.util.Locale.ROOT, s, p, mb, dt))
    }
    spark.stop()
  }
}
