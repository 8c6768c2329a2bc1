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
    import org.apache.spark.sql.functions._
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"  $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    for (i <- 1 to 3) {
      val emb = spark.read.parquet(s"$base/embedded")
      val sig = spark.read.parquet(s"$base/sig")
      println(s"ITER $i")
      // (a) current shape: window cap + self-join + distinct
      val cappedW = {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("table_idx"), col("sig")).orderBy(col("doc_id"))
        sig.withColumn("__rk", row_number().over(w))
          .where(col("__rk") <= 5000).drop("__rk")
      }
      val joinPairs = cappedW
        .select(col("doc_id").as("id_a"), col("table_idx"), col("sig"))
        .join(
          cappedW.select(col("doc_id").as("id_b"), col("table_idx"), col("sig")),
          Seq("table_idx", "sig"))
        .where(col("id_a") < col("id_b"))
        .select("id_a", "id_b")
        .distinct()
      time("a: window+join+distinct")(println("    n=" + joinPairs.count()))
      // (b) groupBy collect_list + in-bucket pair explode + distinct
      val a = slice(sort_array(collect_list(col("doc_id"))), 1, 5000)
      val grouped = sig.groupBy("table_idx", "sig").agg(a.as("__ids"))
        .where(size(col("__ids")) > 1)
      val idsC = col("__ids")
      val pairsExpr = flatten(
        transform(sequence(lit(0), size(idsC) - 2), i =>
          transform(slice(idsC, i + 2, size(idsC) - i - 1), x =>
            struct(element_at(idsC, i + 1).as("id_a"), x.as("id_b")))))
      val aggPairs = grouped
        .select(explode(pairsExpr).as("__p"))
        .select(col("__p.id_a").as("id_a"), col("__p.id_b").as("id_b"))
        .distinct()
      time("b: groupBy+explode+distinct")(println("    n=" + aggPairs.count()))
      val t0 = System.nanoTime()
      val n = NearDup.embeddingNearDupPairsFromSig(emb, sig).count()
      println(f"  FULL(current): $n pairs in ${(System.nanoTime() - t0) / 1e9}%.2f s")
      // (c) full with agg pairs + verify
      val t1 = System.nanoTime()
      val withVecs = aggPairs
        .join(emb.select(col("doc_id").as("id_a"), col("embedding").as("__va")), Seq("id_a"))
        .join(emb.select(col("doc_id").as("id_b"), col("embedding").as("__vb")), Seq("id_b"))
      val n2 = withVecs
        .withColumn("cos", graft.functions.VectorFunctions.cosineSimilarity(col("__va"), col("__vb")))
        .where(col("cos") >= 0.999999)
        .count()
      println(f"  FULL(agg): $n2 pairs in ${(System.nanoTime() - t1) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
