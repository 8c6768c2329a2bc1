package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{Embedder, VectorFunctions}
import graft.operators.{FirstCollision, NearDup}

/** Scratch A/B probe for the q_embed_neardup verify shape at synthetic
  * scale: (A) verify-inline carrying (vectors ride the probe rows into
  * the candidate join), (B) pair-stream attach (the round-11 shape —
  * join candidates slim, then two SHUFFLE_HASH vector attaches on the
  * pair stream). Both run off the same persisted embedded+sig tables.
  * Usage: runMain graft.tools.EmbShapeAB [sfDir] [iters]
  */
object EmbShapeAB {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "target/sf10-synth"
    val iters = if (args.length > 1) args(1).toInt else 2
    val variants = if (args.length > 2) args(2) else "ABC"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false")
      .appName("emb-shape-ab").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val slug = dir.replaceAll("[^a-zA-Z0-9]", "_")
    val base = s"/tmp/graft_embshapeab_$slug"
    if (!new java.io.File(s"$base/_built").exists()) {
      Embedder.withEmbedding(spark.read.parquet(s"$dir/documents.parquet"))
        .select("doc_id", "embedding")
        .write.mode("overwrite").parquet(s"$base/embedded")
      NearDup.embeddingSignatures(spark.read.parquet(s"$base/embedded"))
        .write.mode("overwrite").parquet(s"$base/sig")
      new java.io.File(s"$base/_built").createNewFile()
    }
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      // ROOT locale, like Bench's num(): a tr-TR/de-DE JVM would print
      // comma decimals and any grep/parse of these logs would mis-read
      println("  %s: %7.2f s  (%d rows)".formatLocal(
        java.util.Locale.ROOT, label, (System.nanoTime() - t0) / 1e9, n))
    }
    val nT = NearDup.EmbedLshParams.numTables
    for (i <- 1 to iters) {
      println(s"ITER $i")
      val df = spark.read.parquet(s"$base/embedded")
      val sig = spark.read.parquet(s"$base/sig")

      // A: current shape through the public API
      if (variants.contains("A")) time("A carry-inline ") {
        NearDup.embeddingNearDupPairsFromSig(df, sig).count()
      }

      // B: round-11 shape — slim candidate join, pair-stream attaches
      if (variants.contains("B")) time("B pair-attach  ") {
        import org.apache.spark.sql.expressions.Window
        val n = spark.sessionState.conf.numShufflePartitions
        val w = Window.partitionBy(col("table_idx"), col("sig"))
          .orderBy(col("doc_id"))
        val capped = sig
          .repartition(n, col("table_idx"), col("sig"))
          .withColumn("__rk", row_number().over(w))
          .where(col("__rk") <= 5000).drop("__rk")
        val probe = FirstCollision.withSurvivalMap(
          capped, "doc_id", "table_idx", "sig", nT)
        val pairs = FirstCollision.pairs(
          probe, probe, "doc_id", "table_idx", "sig", nT, "id_a", "id_b", _ < _)
        val withVecs = pairs
          .join(df.select(col("doc_id").as("id_a"), col("embedding").as("__va"))
            .hint("SHUFFLE_HASH"), Seq("id_a"))
          .join(df.select(col("doc_id").as("id_b"), col("embedding").as("__vb"))
            .hint("SHUFFLE_HASH"), Seq("id_b"))
        withVecs
          .withColumn("cos",
            VectorFunctions.cosineSimilarity(col("__va"), col("__vb")))
          .where(col("cos") >= 0.999999)
          .count()
      }

      // D/E: decomposition of the carry-inline verify cost (round-12
      // verdict #3 — "is the 62M float-cosine pass the dominant term?").
      // Both keep A's exact join shape and replace only what they
      // measure: D swaps the cosine verify for a trivial (never-false,
      // not-foldable, both-sides-touching) predicate — A minus D is the
      // pure verify-FLOP cost; E additionally carries int8-quantized
      // vectors (array<tinyint>, 32 B vs 128 B) under the same trivial
      // predicate — D minus E is the payload-width cost. E's remainder
      // is the join/exchange/output floor no verify change can touch.
      def cappedSig(): DataFrame = {
        import org.apache.spark.sql.expressions.Window
        val n = spark.sessionState.conf.numShufflePartitions
        val w = Window.partitionBy(col("table_idx"), col("sig"))
          .orderBy(col("doc_id"))
        sig.repartition(n, col("table_idx"), col("sig"))
          .withColumn("__rk", row_number().over(w))
          .where(col("__rk") <= 5000).drop("__rk")
      }
      def carryShape(vec: DataFrame): Long = {
        val probe = FirstCollision.withSurvivalMap(
          cappedSig(), "doc_id", "table_idx", "sig", nT)
          .join(vec.hint("SHUFFLE_HASH"), Seq("doc_id"))
        FirstCollision.pairs(
          probe, probe, "doc_id", "table_idx", "sig", nT, "id_a", "id_b", _ < _,
          carryA = Seq("__v" -> "__va"), carryB = Seq("__v" -> "__vb"))
          .where(element_at(col("__va"), 1).cast("double") +
            element_at(col("__vb"), 1).cast("double") > lit(-1e18))
          .count()
      }
      if (variants.contains("D")) time("D carry-noverify") {
        carryShape(df.select(col("doc_id"), col("embedding").as("__v")))
      }
      if (variants.contains("E")) time("E carry-int8    ") {
        carryShape(df.select(col("doc_id"),
          transform(col("embedding"),
            x => round(x * 127).cast("byte")).as("__v")))
      }

      // C: the faithful round-11 shape — join-back survival map, slim
      // unpinned candidate join, pair-stream attaches
      if (variants.contains("C")) time("C r11 joinback ") {
        import org.apache.spark.sql.expressions.Window
        val n = spark.sessionState.conf.numShufflePartitions
        val w = Window.partitionBy(col("table_idx"), col("sig"))
          .orderBy(col("doc_id"))
        val capped = sig
          .repartition(n, col("table_idx"), col("sig"))
          .withColumn("__rk", row_number().over(w))
          .where(col("__rk") <= 5000).drop("__rk")
        val docMaps = capped.groupBy(col("doc_id"))
          .agg(map_from_entries(
            collect_list(struct(col("table_idx"), col("sig")))).as("__m"))
        val probe = capped
          .select(col("doc_id"), col("table_idx"), col("sig"))
          .join(docMaps, Seq("doc_id"))
        val a = probe.select(col("doc_id").as("id_a"),
          col("table_idx"), col("sig"), col("__m").as("__ma"))
        val b = probe.select(col("doc_id").as("id_b"),
          col("table_idx"), col("sig"), col("__m").as("__mb"))
        // inline MAP-keyed earlier-collision predicate (the round-11
        // encoding; the shared kernel's wrapper is array-slot-keyed now)
        val earlier = (0 until nT).map(t =>
          (col("table_idx") > t) &&
            element_at(col("__ma"), lit(t)).isNotNull &&
            element_at(col("__mb"), lit(t)).isNotNull &&
            (element_at(col("__ma"), lit(t)) === element_at(col("__mb"), lit(t))))
          .reduce(_ || _)
        val pairs = a.join(b, Seq("table_idx", "sig"))
          .where(col("id_a") < col("id_b") && !earlier)
          .select("id_a", "id_b")
        pairs
          .join(df.select(col("doc_id").as("id_a"), col("embedding").as("__va"))
            .hint("SHUFFLE_HASH"), Seq("id_a"))
          .join(df.select(col("doc_id").as("id_b"), col("embedding").as("__vb"))
            .hint("SHUFFLE_HASH"), Seq("id_b"))
          .withColumn("cos",
            VectorFunctions.cosineSimilarity(col("__va"), col("__vb")))
          .where(col("cos") >= 0.999999)
          .count()
      }

      // V/W: the q_embed_neardup_vec decomposition on the CONTINUOUS
      // 64-dim embeddings corpus (round-13 verdict #2 — the original
      // D/E floor claim was measured on a corpus where 51 of 63.5 M
      // accepted pairs were duplicate-vector artifacts of the md5
      // embedder's 10^4-value range; SynthScale's perturbed replicas
      // make this space continuous). V = the shipped vec-query shape
      // (center-0 signatures, 0.99 cosine verify); W = the identical
      // join carrying the vectors under the trivial never-false
      // predicate. V minus W = the verify-FLOP term on a realistic
      // corpus; W's remainder is the enumeration/output floor.
      if (variants.contains("V") || variants.contains("W")) {
        val vdf = spark.read.parquet(s"$dir/embeddings.parquet")
          .select(col("vec_id"), col("embedding"))
        if (!new java.io.File(s"$base/_vbuilt").exists()) {
          NearDup.embeddingSignatures(
              vdf, "vec_id", "embedding", NearDup.VecLshParams, center = 0f)
            .write.mode("overwrite").parquet(s"$base/vsig")
          new java.io.File(s"$base/_vbuilt").createNewFile()
        }
        val vsig = spark.read.parquet(s"$base/vsig")
        val nTV = NearDup.VecLshParams.numTables
        if (variants.contains("V")) time("V vec-full     ") {
          NearDup.embeddingNearDupPairsFromSig(
            vdf, vsig, "vec_id", "embedding",
            minCosine = 0.99, numTables = nTV).count()
        }
        if (variants.contains("W")) time("W vec-noverify ") {
          import org.apache.spark.sql.expressions.Window
          val n = spark.sessionState.conf.numShufflePartitions
          val w = Window.partitionBy(col("table_idx"), col("sig"))
            .orderBy(col("vec_id"))
          val capped = vsig
            .repartition(n, col("table_idx"), col("sig"))
            .withColumn("__rk", row_number().over(w))
            .where(col("__rk") <= 5000).drop("__rk")
          val probe = FirstCollision.withSurvivalMap(
              capped, "vec_id", "table_idx", "sig", nTV)
            .join(vdf.select(col("vec_id"), col("embedding").as("__v"))
              .hint("SHUFFLE_HASH"), Seq("vec_id"))
          FirstCollision.pairs(
            probe, probe, "vec_id", "table_idx", "sig", nTV, "id_a", "id_b", _ < _,
            carryA = Seq("__v" -> "__va"), carryB = Seq("__v" -> "__vb"))
            .where(element_at(col("__va"), 1).cast("double") +
              element_at(col("__vb"), 1).cast("double") > lit(-1e18))
            .count()
        }
      }
    }
    spark.stop()
  }
}
