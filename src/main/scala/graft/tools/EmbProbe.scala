package graft.tools

import org.apache.spark.sql.SparkSession
import graft.functions.Embedder
import graft.operators.NearDup

/** Scratch probe: per-stage timing of the q_embed_neardup probe path
  * against a locally persisted embedded+signature table pair. */
object EmbProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false")
      .appName("emb-probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = "/tmp/graft_embprobe"
    if (!new java.io.File(s"$base/_built").exists()) {
      Embedder.withEmbedding(spark.read.parquet(s"$dir/documents.parquet"))
        .select("doc_id", "embedding")
        .write.mode("overwrite").parquet(s"$base/embedded")
      NearDup.embeddingSignatures(spark.read.parquet(s"$base/embedded"))
        .write.mode("overwrite").parquet(s"$base/sig")
      new java.io.File(s"$base/_built").createNewFile()
    }
    for (i <- 1 to 2) {
      val emb = spark.read.parquet(s"$base/embedded")
      val sig = spark.read.parquet(s"$base/sig")
      val t0 = System.nanoTime()
      val n = NearDup.embeddingNearDupPairsFromSig(emb, sig).count()
      println(f"ITER $i: $n pairs in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
