package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions
import graft.operators.FlatKnn

/** Decomposition probe for q_hnsw_recall at synthetic scale (round-14
  * verdict #5: 65.7 s at x100 — 3rd-largest gate row, never profiled).
  * The query is recallOf(exact FlatKnn over the float-normalized space,
  * q_hnsw_knn's artifact probe); this times each term in one JVM,
  * median-of-3 after a warm pass:
  *
  *   norm    — materialize the normalized corpus alone
  *   exact   — FlatKnn top-10 over the normalized corpus
  *   approx  — the shipped q_hnsw_knn builder (restored-artifact probe)
  *   full    — the shipped q_hnsw_recall builder
  *
  * Usage: runMain graft.tools.HnswRecallProfile [sfDir] [iters]
  */
object HnswRecallProfile {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "target/sf10-synth"
    val iters = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false")
      .appName("hnsw-recall-profile").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    // the exact side exactly as q_hnsw_recall builds it
    val n = VectorFunctions.l2Norm(col("embedding"))
    val nEmb = emb.select(col("vec_id"),
      when(n === 0.0, col("embedding"))
        .otherwise(transform(col("embedding"), x =>
          (x.cast("double") / n).cast("float")))
        .as("embedding"))
    val qv = emb.where(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0)
    val qn = {
      val nn = math.sqrt(qv.map(v => v.toDouble * v).sum)
      if (nn == 0.0) qv else qv.map(v => (v / nn).toFloat)
    }

    def med(xs: Seq[Double]): Double = { val s = xs.sorted; s(s.size / 2) }
    def time(label: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save() // warm
      val ts = (1 to iters).map { _ =>
        System.gc()
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[hnsw-recall-profile] $label%-8s median ${med(ts)}%8.2f s  " +
        ts.map(t => f"$t%.2f").mkString("(", ", ", ")"))
    }

    time("norm")(nEmb)
    time("normF")(emb.select(col("vec_id"),
      VectorFunctions.l2NormalizeFloat(col("embedding")).as("embedding")))
    time("exact")(FlatKnn.search(nEmb, qn, 10))
    time("exactF")(FlatKnn.search(
      emb.select(col("vec_id"),
        VectorFunctions.l2NormalizeFloat(col("embedding")).as("embedding")),
      qn, 10))
    time("approx")(graft.SparkEntry.queries("q_hnsw_knn")(spark, dir))
    time("full")(graft.SparkEntry.queries("q_hnsw_recall")(spark, dir))
    spark.stop()
  }
}
