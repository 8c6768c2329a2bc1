package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.SimHash

/** Dev probe: SimHash candidate/output volumetrics at a given SF dir —
  * distinguishes "slow because many true near-dup pairs" (output-bound,
  * expected on the dup-family corpus) from "slow because candidate
  * generation degenerated" (bucket skew). Usage:
  *   sbt "runMain graft.tools.SimhashProbe <sfDir>"
  */
object SimhashProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("simhash-probe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val p = SimHash.Params()
    val fp = SimHash.fingerprints(docs, "doc_id", "text", p).cache()
    val n = fp.count()
    val chunkVals = (0 until p.chunks).map(c =>
      shiftright(col("simhash"), c * p.chunkBits)
        .bitwiseAND(lit((1L << p.chunkBits) - 1)))
    val chunked = fp.select(
      col("doc_id"), col("simhash"),
      posexplode(array(chunkVals: _*)).as(Seq("chunk_idx", "chunk_val")))
    val buckets = chunked.groupBy("chunk_idx", "chunk_val").count()
      .agg(
        count(lit(1)).as("n_buckets"),
        max("count").as("max_bucket"),
        sum(col("count") * (col("count") - 1) / 2).as("cand_pairs"))
      .head()
    val t0 = System.nanoTime()
    val out = SimHash.nearDuplicatePairs(docs, "doc_id", "text", p).count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"docs=$n buckets=${buckets.getLong(0)} maxBucket=${buckets.getLong(1)} " +
      f"candPairs(uncapped)=${buckets.getAs[Any](2)} outPairs=$out pairTime=$sec%.2f s")
    spark.stop()
  }
}
