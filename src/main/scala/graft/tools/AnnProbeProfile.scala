package graft.tools

import org.apache.spark.sql.SparkSession

/** Phase profile of the q_ann_probe_rule build+run: where does the
  * wall-time go — candidate materialization, rule/optimizer work, or
  * execution? Dev probe only. */
object AnnProbeProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"$label%-40s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    // warm-up: full query once
    graft.SparkEntry.queries("q_ann_probe_rule")(spark, dir)
      .write.format("noop").mode("overwrite").save()
    (1 to 3).foreach { i =>
      println(s"--- sample $i")
      val df = t("build (rule + checkpoints + ofRows)") {
        graft.SparkEntry.queries("q_ann_probe_rule")(spark, dir)
      }
      t("noop write (execution)") {
        df.write.format("noop").mode("overwrite").save()
      }
      // isolate: one candidate materialization
      import graft.operators.LshIndex
      import org.apache.spark.sql.functions.col
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val qv = emb.where(col("vec_id") === 0)
        .select("embedding").head().getSeq[Float](0)
      // newest matching cache dir (the warm-up above just built/used it);
      // fail with a clear message rather than NPE if it's absent
      val tmpBase = new java.io.File(System.getProperty("java.io.tmpdir"))
      val sigDir = Option(tmpBase.listFiles())
        .getOrElse(Array.empty[java.io.File])
        .filter(f => f.getName.startsWith("graft_lsh_idx_") && f.isDirectory)
        .sortBy(-_.lastModified())
        .headOption
        .map(f => s"${f.getAbsolutePath}/sigs")
        .getOrElse(sys.error(
          "no graft_lsh_idx_* cache dir found — run q_ann_probe_rule once first"))
      val p = LshIndex.Params()
      val sigs = LshIndex.planes(p).map(LshIndex.signatureLocal(qv.toArray, _))
      t("one candidate probe + checkpoint") {
        LshIndex.prunedCandidateIds(spark.read.parquet(sigDir), sigs)
          .localCheckpoint(true)
      }
      val knn = t("FlatKnn build+optimize (2 branches, rule on)") {
        import graft.plans.AnnProbeRule
        if (!spark.experimental.extraOptimizations.contains(AnnProbeRule))
          spark.experimental.extraOptimizations =
            spark.experimental.extraOptimizations :+ AnnProbeRule
        AnnProbeRule.register("prof_lsh",
          AnnProbeRule.lshArtifact(() => spark.read.parquet(sigDir), p))
        spark.conf.set(AnnProbeRule.ConfKey, "true")
        spark.conf.set(AnnProbeRule.ArtifactKey, "prof_lsh")
        try {
          val a = graft.operators.FlatKnn.search(emb, qv, 10)
          val b = graft.operators.FlatKnn.search(emb, qv, 2000)
          val u = a.unionByName(b)
          u.queryExecution.optimizedPlan
        } finally {
          spark.conf.set(AnnProbeRule.ConfKey, "false")
          spark.conf.unset(AnnProbeRule.ArtifactKey)
        }
      }
      t("ofRows re-analysis") {
        org.apache.spark.sql.graft.ColumnBridge.ofRows(spark, knn)
      }
    }
    spark.stop()
  }
}
