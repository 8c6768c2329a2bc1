package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Sizes the skew the round-15 verdict's #1 names: per-shingle bucket
  * sizes in the q_ngram_jaccard prefix table (the candidate join's key)
  * and per-doc pair counts on the verify joins' keys — so the salting
  * bound is picked from measured distributions, not a guess. Per-task
  * candidate-combination work is Sum over a task's g of m², so the top
  * buckets' m² against the total says exactly how lopsided the
  * candidate stage's 32-way hash split can get.
  *
  * Usage: runMain graft.tools.JaccardBucketCensus [sfDir]
  */
object JaccardBucketCensus {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "target/sf10-synth"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false")
      .appName("jaccard-bucket-census").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val prefixes = graft.operators.JaccardJoin
      .prefixTable(docs, "doc_id", "text", k = 3, tNum = 4, tDen = 5)
      .select("g").persist()

    val buckets = prefixes.groupBy("g").agg(count(lit(1)).as("m")).persist()
    val stats = buckets.agg(
      count(lit(1)).as("n_buckets"),
      sum(col("m")).as("prefix_rows"),
      sum(col("m") * col("m")).as("sum_m2"),
      max(col("m")).as("max_m")).head()
    println(s"[census] buckets=${stats.getLong(0)} prefixRows=${stats.getLong(1)} sumM2=${stats.getLong(2)} maxM=${stats.getLong(3)}")
    println("[census] top-20 buckets by m (work share = m^2/sumM2):")
    val sumM2 = stats.getLong(2).toDouble
    buckets.orderBy(col("m").desc).limit(20).collect().foreach { r =>
      val m = r.getLong(1)
      println(f"[census]   g=${r.getLong(0)}%20d  m=$m%8d  m2share=${m * m / sumM2 * 100}%6.2f%%")
    }
    // quantiles of the bucket-size distribution
    val q = buckets.stat.approxQuantile("m",
      Array(0.5, 0.9, 0.99, 0.999, 0.9999), 0.0001)
    println(s"[census] m quantiles p50/p90/p99/p999/p9999 = ${q.mkString("/")}")

    // verify-side skew: pairs per doc_a / doc_b
    val pairs = graft.SparkEntry.queries("q_ngram_jaccard")(spark, dir)
      .select("doc_a", "doc_b").persist()
    val nPairs = pairs.count()
    val topA = pairs.groupBy("doc_a").count().orderBy(col("count").desc).limit(5).collect()
    val topB = pairs.groupBy("doc_b").count().orderBy(col("count").desc).limit(5).collect()
    println(s"[census] verified pairs=$nPairs topDocA=${topA.map(r => r.get(0) + ":" + r.getLong(1)).mkString(",")} topDocB=${topB.map(r => r.get(0) + ":" + r.getLong(1)).mkString(",")}")
    spark.stop()
  }
}
