package graft

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll

import graft.operators.FlatKnn
import graft.plans.AnnProbeRule

/** The opt-in ANN plan rewrite: the optimizer turns the exact-kNN shape
  * into an LSH bucket probe + exact re-rank when (and only when) the
  * session conf enables it. */
class AnnProbeRuleSpec extends SparkSpec with BeforeAndAfterAll {

  private lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
  private lazy val q0: Seq[Float] =
    emb.where(col("vec_id") === 0).select("embedding").head().getSeq[Float](0)

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ AnnProbeRule
  }

  override def afterAll(): Unit = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == AnnProbeRule)
    spark.conf.unset(AnnProbeRule.ConfKey)
    super.afterAll()
  }

  test("disabled (default): the kNN plan scans the full corpus, no signature filter") {
    spark.conf.set(AnnProbeRule.ConfKey, "false")
    val plan = FlatKnn.search(emb, q0, 5).queryExecution.optimizedPlan.toString
    assert(!plan.contains("lsh_signature"))
  }

  test("enabled: the optimizer injects the LSH signature probe filter") {
    spark.conf.set(AnnProbeRule.ConfKey, "true")
    try {
      val df = FlatKnn.search(emb, q0, 5)
      val plan = df.queryExecution.optimizedPlan.toString
      assert(plan.contains("lsh_signature"), s"no probe filter in:\n$plan")
      // the probe is still ranked and limited: self-vector first at dist 0
      val rows = df.collect()
      assert(rows.nonEmpty && rows.length <= 5)
      assert(rows.head.getAs[Long]("vec_id") === 0L)
      assert(math.abs(rows.head.getAs[Double]("dist")) < 1e-9)
      // every returned id must be an LSH bucket candidate of the query
      val ps = graft.operators.LshIndex.planes(
        graft.operators.LshIndex.Params(dim = q0.length))
      val qSigs = ps.map(graft.operators.LshIndex.signatureLocal(q0.toArray, _))
      val candidateIds = emb
        .where(ps.indices
          .map(t => graft.operators.LshIndex.signatureCol(col("embedding"), ps(t)) === qSigs(t))
          .reduce(_ || _))
        .select("vec_id").collect().map(_.getLong(0)).toSet
      assert(rows.map(_.getAs[Long]("vec_id")).forall(candidateIds))
    } finally spark.conf.set(AnnProbeRule.ConfKey, "false")
  }

  test("under-filled probe falls back to the exact scan (never fewer than k rows)") {
    spark.conf.set(AnnProbeRule.ConfKey, "true")
    try {
      // a far-corner query vector: its sign-buckets hold (almost) no
      // corpus members, so the probe alone would under-fill k — the
      // scalar-subquery fallback must widen to the exact scan
      val far = Array.fill(q0.length)(100.0f)
      val ps = graft.operators.LshIndex.planes(
        graft.operators.LshIndex.Params(dim = far.length))
      val qSigs = ps.map(graft.operators.LshIndex.signatureLocal(far, _))
      val nCand = emb
        .where(ps.indices
          .map(t => graft.operators.LshIndex.signatureCol(col("embedding"), ps(t)) === qSigs(t))
          .reduce(_ || _))
        .count()
      val k = (nCand + 5).toInt // strictly more than the probe can fill
      val df = FlatKnn.search(emb, far.toSeq, k)
      assert(df.queryExecution.optimizedPlan.toString.contains("scalar-subquery"),
        "fallback count subquery missing from the rewritten plan")
      val got = df.collect()
      assert(got.length === k, s"probe returned ${got.length} of $k")
      // and the fallback result is the EXACT top-k
      spark.conf.set(AnnProbeRule.ConfKey, "false")
      val exact = FlatKnn.search(emb, far.toSeq, k).collect()
      assert(got.map(_.getAs[Long]("vec_id")).toSeq ===
        exact.map(_.getAs[Long]("vec_id")).toSeq)
    } finally spark.conf.set(AnnProbeRule.ConfKey, "false")
  }

  test("kind=ivf: cell-membership probe from the REGISTERED persisted quantizer, and the probe choice is pinned") {
    import graft.operators.IvfIndex
    spark.conf.set(AnnProbeRule.ConfKey, "true")
    spark.conf.set(AnnProbeRule.KindKey, "ivf")
    try {
      AnnProbeRule.registerIvf(
        IvfIndex.centroids(emb, IvfIndex.Params()), IvfIndex.Params().nProbe)
      val df = FlatKnn.search(emb, q0, 5)
      val plan = df.queryExecution.optimizedPlan.toString
      // which probe was chosen: the IVF argmin membership, NOT the LSH
      // signature predicate
      assert(plan.contains("array_position"), s"no cell probe in:\n$plan")
      assert(!plan.contains("lsh_signature"), s"wrong probe kind in:\n$plan")
      assert(plan.contains("scalar-subquery"), "under-k guard missing")
      // result equals the hand-built IVF search over the same quantizer
      val expect = IvfIndex.search(emb, q0, 5)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val got = df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(got === expect)
    } finally {
      spark.conf.set(AnnProbeRule.ConfKey, "false")
      spark.conf.set(AnnProbeRule.KindKey, "lsh")
      AnnProbeRule.clearIvfRegistry()
    }
  }

  test("kind=ivf with no registered quantizer: no rewrite, the exact plan stands") {
    spark.conf.set(AnnProbeRule.ConfKey, "true")
    spark.conf.set(AnnProbeRule.KindKey, "ivf")
    try {
      AnnProbeRule.clearIvfRegistry()
      val plan = FlatKnn.search(emb, q0, 5).queryExecution.optimizedPlan.toString
      assert(!plan.contains("array_position") && !plan.contains("lsh_signature"),
        s"rewrite fired without an artifact:\n$plan")
    } finally {
      spark.conf.set(AnnProbeRule.ConfKey, "false")
      spark.conf.set(AnnProbeRule.KindKey, "lsh")
    }
  }

  test("a user's own distance pre-filter does not disable the rewrite (guard matches the injected shape only)") {
    spark.conf.set(AnnProbeRule.ConfKey, "true")
    try {
      import graft.functions.VectorFunctions
      val radius = emb
        .where(VectorFunctions.euclidean(col("embedding"),
          typedLit(q0)) < 100.0)
      val df = FlatKnn.search(radius, q0, 5)
      val plan = df.queryExecution.optimizedPlan.toString
      assert(plan.contains("lsh_signature"),
        s"radius pre-filter wrongly suppressed the probe:\n$plan")
      // and fixpoint idempotence still holds: exactly ONE probe filter
      assert("scalar-subquery".r.findAllIn(plan).length <= 2, // guard + its ref
        s"probe stacked more than once:\n$plan")
      df.collect() // sanity: executes
    } finally spark.conf.set(AnnProbeRule.ConfKey, "false")
  }

  test("an unknown probe kind fails loudly instead of silently probing LSH") {
    spark.conf.set(AnnProbeRule.ConfKey, "true")
    spark.conf.set(AnnProbeRule.KindKey, "hnswish-typo")
    try {
      val e = intercept[Exception] {
        FlatKnn.search(emb, q0, 5).queryExecution.optimizedPlan
      }
      def msgs(t: Throwable): String = Iterator.iterate(t)(_.getCause)
        .takeWhile(_ != null).map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
      assert(msgs(e).contains("not a known probe kind"), msgs(e))
    } finally {
      spark.conf.set(AnnProbeRule.ConfKey, "false")
      spark.conf.set(AnnProbeRule.KindKey, "lsh")
    }
  }

  test("the rewrite leaves non-kNN sorts alone") {
    spark.conf.set(AnnProbeRule.ConfKey, "true")
    try {
      val plan = spark.read.parquet(s"$sfDir/orders.parquet")
        .orderBy(col("o_totalprice").desc).limit(5)
        .queryExecution.optimizedPlan.toString
      assert(!plan.contains("lsh_signature"))
    } finally spark.conf.set(AnnProbeRule.ConfKey, "false")
  }
}
