package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.NearDup

/** Scratch probe: stage attribution for q_neardup_pairs. */
object NdProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false")
      .appName("nd-probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"  $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val p = NearDup.Params()
    for (i <- 1 to 3) {
      println(s"ITER $i")
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val docsSh = NearDup.docShingles(docs, "doc_id", "text", p)
      time("shingles only")(docsSh.write.format("noop").mode("overwrite").save())
      val bands = NearDup.bandRows(docsSh, "doc_id", p)
      time("band rows (minhash)")(bands.write.format("noop").mode("overwrite").save())
      time("FULL")(
        NearDup.nearDuplicatePairs(docs).write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
