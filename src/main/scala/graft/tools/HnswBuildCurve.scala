package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.HnswIndex

/** Measures the DRIVER-LOCAL HNSW build-time curve — the basis for
  * [[HnswIndex.DefaultMaxRows]]. The driver build is a single-threaded
  * O(n log n) insert loop; this prints seconds at growing n over real
  * corpus vectors so the redirect threshold is a measurement, not a
  * constant (SCALING.md records the curve). Usage:
  *   runMain graft.tools.HnswBuildCurve [sfDir] [n1,n2,...]
  */
object HnswBuildCurve {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "target/sf1-synth"
    val ns = (if (args.length > 1) args(1) else "2000,5000,10000,20000,50000")
      .split(",").map(_.trim.toInt).toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .appName("hnsw-build-curve")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val maxN = ns.max
    val all = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding")
      .orderBy("vec_id")
      .limit(maxN)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    println(s"[curve] corpus $dir rows available = ${all.length}")
    // one warmup at the smallest n so JIT doesn't bill the first point
    HnswIndex.build(all.iterator.take(ns.min))
    ns.filter(_ <= all.length).foreach { n =>
      val t0 = System.nanoTime()
      val idx = HnswIndex.build(all.iterator.take(n))
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[curve] n=$n%7d build=$sec%8.2f s  (${sec * 1000 / n}%6.3f ms/insert, size=${idx.size})")
    }
    spark.stop()
  }
}
