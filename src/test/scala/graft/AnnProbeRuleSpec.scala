package graft

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll

import graft.operators.{FlatKnn, IvfIndex, LshIndex}
import graft.plans.AnnProbeRule

/** The opt-in ANN plan rewrite: the optimizer substitutes the PERSISTED
  * index artifact's probe plan (pruned candidate ids + existence join +
  * artifact-count guard) for the exact-kNN scan when (and only when)
  * the session conf enables it and names a registered artifact. */
class AnnProbeRuleSpec extends SparkSpec with BeforeAndAfterAll {

  private lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
  private lazy val q0: Seq[Float] =
    emb.where(col("vec_id") === 0).select("embedding").head().getSeq[Float](0)

  private val idxRoot =
    java.nio.file.Files.createTempDirectory("ann_probe_spec").toString
  private def sigDir = s"$idxRoot/sigs"
  private def asnDir = s"$idxRoot/assignments"

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ AnnProbeRule
    // the persisted artifacts the registered probes read (the demo-cache
    // pattern: sig table partitionBy(table_idx), assignments by cell)
    LshIndex.signatureTable(emb)
      .write.mode("overwrite").partitionBy("table_idx").parquet(sigDir)
    val cents = IvfIndex.centroids(emb, IvfIndex.Params())
    IvfIndex.assignmentsForWrite(emb, cents)
      .write.mode("overwrite").partitionBy("cell").parquet(asnDir)
    AnnProbeRule.register("spec_lsh",
      AnnProbeRule.lshArtifact(() => spark.read.parquet(sigDir), LshIndex.Params()))
    AnnProbeRule.register("spec_ivf",
      AnnProbeRule.ivfArtifact(
        () => spark.read.parquet(asnDir), cents, IvfIndex.Params().nProbe))
  }

  override def afterAll(): Unit = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == AnnProbeRule)
    spark.conf.unset(AnnProbeRule.ConfKey)
    spark.conf.unset(AnnProbeRule.ArtifactKey)
    AnnProbeRule.clearRegistry()
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(idxRoot))
    super.afterAll()
  }

  private def withProbe[A](token: String)(body: => A): A = {
    spark.conf.set(AnnProbeRule.ConfKey, "true")
    spark.conf.set(AnnProbeRule.ArtifactKey, token)
    try body
    finally {
      spark.conf.set(AnnProbeRule.ConfKey, "false")
      spark.conf.unset(AnnProbeRule.ArtifactKey)
    }
  }

  test("disabled (default): the kNN plan scans the full corpus, no artifact probe") {
    spark.conf.set(AnnProbeRule.ConfKey, "false")
    val plan = FlatKnn.search(emb, q0, 5).queryExecution.optimizedPlan.toString
    assert(!plan.contains("ExistenceJoin"))
  }

  test("enabled: the rewrite probes the persisted sig table via an existence join, not the corpus") {
    withProbe("spec_lsh") {
      val df = FlatKnn.search(emb, q0, 5)
      val plan = df.queryExecution.optimizedPlan.toString
      assert(plan.contains("ExistenceJoin"), s"no artifact probe join in:\n$plan")
      val physical = df.queryExecution.executedPlan.toString
      assert(physical.contains("sigs"),
        s"probe does not read the persisted sig table:\n$physical")
      // the probe is still ranked and limited: self-vector first at dist 0
      val rows = df.collect()
      assert(rows.nonEmpty && rows.length <= 5)
      assert(rows.head.getAs[Long]("vec_id") === 0L)
      assert(math.abs(rows.head.getAs[Double]("dist")) < 1e-9)
      // every returned id must be an LSH bucket candidate of the query
      val ps = LshIndex.planes(LshIndex.Params(dim = q0.length))
      val qSigs = ps.map(LshIndex.signatureLocal(q0.toArray, _))
      val candidateIds = LshIndex
        .prunedCandidateIds(spark.read.parquet(sigDir), qSigs)
        .collect().map(_.getLong(0)).toSet
      assert(rows.map(_.getAs[Long]("vec_id")).forall(candidateIds))
    }
  }

  test("the rewritten plan's guard counts the ARTIFACT, and the corpus is scanned exactly once") {
    withProbe("spec_lsh") {
      val df = FlatKnn.search(emb, q0, 5)
      val physical = df.queryExecution.executedPlan.toString
      // exactly one scan of the corpus parquet: the probe side of the
      // existence join — the guard and the candidates read the artifact
      val corpusScans = "embeddings\\.parquet".r.findAllIn(physical).length
      assert(corpusScans === 1,
        s"corpus scanned $corpusScans times (probe must read the artifact):\n$physical")
      assert("sigs".r.findAllIn(physical).nonEmpty, "artifact table not read")
      df.collect()
    }
  }

  test("under-filled probe falls back to the exact scan (never fewer than k rows)") {
    withProbe("spec_lsh") {
      // a far-corner query vector: its sign-buckets hold (almost) no
      // corpus members, so the probe alone would under-fill k — the
      // scalar-subquery fallback must widen to the exact scan
      val far = Array.fill(q0.length)(100.0f)
      val ps = LshIndex.planes(LshIndex.Params(dim = far.length))
      val qSigs = ps.map(LshIndex.signatureLocal(far, _))
      val nCand = LshIndex
        .prunedCandidateIds(spark.read.parquet(sigDir), qSigs)
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
    }
  }

  test("ivf artifact: cell-membership probe from the PERSISTED assignments, partition-pruned") {
    withProbe("spec_ivf") {
      val df = FlatKnn.search(emb, q0, 5)
      val plan = df.queryExecution.optimizedPlan.toString
      assert(plan.contains("ExistenceJoin"), s"no cell probe in:\n$plan")
      assert(plan.contains("scalar-subquery"), "under-k guard missing")
      // the physical probe reads the assignments artifact (not the sig
      // table), partition-pruned to the nProbe cells
      val physical = df.queryExecution.executedPlan.toString
      assert(physical.contains("assignments"),
        s"probe does not read the assignments table:\n$physical")
      assert(!physical.contains("sigs"), s"wrong artifact probed in:\n$physical")
      assert(physical.contains("PartitionFilters: [cell"),
        s"assignments read is not partition-pruned:\n$physical")
      // result equals the hand-built IVF search over the same quantizer
      val expect = IvfIndex.search(emb, q0, 5)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val got = df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(got === expect)
    }
  }

  test("a token naming no registered artifact fails loudly instead of silently staying exact") {
    withProbe("never_registered") {
      val e = intercept[Exception] {
        FlatKnn.search(emb, q0, 5).queryExecution.optimizedPlan
      }
      def msgs(t: Throwable): String = Iterator.iterate(t)(_.getCause)
        .takeWhile(_ != null).map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
      assert(msgs(e).contains("names no registered ANN artifact"), msgs(e))
    }
  }

  test("enabled with no artifact token: no rewrite, the exact plan stands") {
    spark.conf.set(AnnProbeRule.ConfKey, "true")
    spark.conf.unset(AnnProbeRule.ArtifactKey)
    try {
      val plan = FlatKnn.search(emb, q0, 5).queryExecution.optimizedPlan.toString
      assert(!plan.contains("ExistenceJoin"),
        s"rewrite fired without an artifact:\n$plan")
    } finally spark.conf.set(AnnProbeRule.ConfKey, "false")
  }

  test("a registered artifact of the WRONG dim never probes a foreign corpus (no rewrite)") {
    // 16-d artifact registered, 64-d query corpus: an implicit match
    // here is exactly the silent recall degradation the explicit token +
    // dim check exist to prevent — the exact plan must stand
    AnnProbeRule.register("spec_wrong_dim",
      AnnProbeRule.lshArtifact(
        () => spark.read.parquet(sigDir), LshIndex.Params(dim = 16)))
    withProbe("spec_wrong_dim") {
      val plan = FlatKnn.search(emb, q0, 5).queryExecution.optimizedPlan.toString
      assert(!plan.contains("ExistenceJoin"),
        s"dim-mismatched artifact was probed:\n$plan")
    }
  }

  test("a user pre-filter that starves the probe still falls back (guard counts SURVIVING candidates, not the raw artifact)") {
    import spark.implicits._
    // 100-row corpus; the registered probe always nominates ids 0..49
    // (50 >= k, so a raw-artifact count would see a well-filled probe);
    // the user's pre-filter keeps ids 48..99, so only {48, 49} survive
    // the probe — without a filter-aware guard the rewrite would return
    // 2 rows where the exact plan returns k
    val corpus = (0 until 100).map(i =>
      (i.toLong, Seq.tabulate(4)(d => (i * 4 + d).toFloat / 400f)))
      .toDF("vec_id", "embedding")
    AnnProbeRule.register("spec_fixed_cands",
      AnnProbeRule.ArtifactProbe("fixed", "vec_id", 4,
        _ => (0 until 50).map(_.toLong).toDF("vec_id")))
    withProbe("spec_fixed_cands") {
      val filtered = corpus.where(col("vec_id") >= 48L)
      val df = FlatKnn.search(filtered, Seq(0f, 0f, 0f, 0f), 10)
      val got = df.collect()
      assert(got.length === 10,
        s"starved probe returned ${got.length} of 10 — guard ignored the pre-filter")
      spark.conf.set(AnnProbeRule.ConfKey, "false")
      val exact = FlatKnn.search(filtered, Seq(0f, 0f, 0f, 0f), 10).collect()
      assert(got.map(_.getAs[Long]("vec_id")).toSeq ===
        exact.map(_.getAs[Long]("vec_id")).toSeq)
    }
  }

  test("a DERIVED same-dim vector expression never probes the artifact (embedding identity checked)") {
    // same table, same dim, same id column — but the ranked vectors are
    // NOT the data the index was built from (here: negated embeddings;
    // equally a normalization or slice). Probing the artifact for them
    // would be a silent recall collapse, so the exact plan must stand.
    // (A mere RENAME of the true column collapses back to the
    // underlying attribute before the rule runs and correctly still
    // probes — same data, same index.)
    val negated = emb.select(col("vec_id"),
      transform(col("embedding"), x => -x).as("embedding"))
    withProbe("spec_lsh") {
      val plan = FlatKnn
        .search(negated, q0, 5)
        .queryExecution.optimizedPlan.toString
      assert(!plan.contains("ExistenceJoin"),
        s"derived-vector query probed the artifact:\n$plan")
      // and the rename case keeps probing (same data, same index)
      val renamed = emb.select(col("vec_id"), col("embedding").as("embedding_v2"))
      val renamedPlan = FlatKnn
        .search(renamed, q0, 5, embCol = "embedding_v2")
        .queryExecution.optimizedPlan.toString
      assert(renamedPlan.contains("ExistenceJoin"),
        s"alias of the true column wrongly suppressed the probe:\n$renamedPlan")
    }
  }

  test("a user's own distance pre-filter does not disable the rewrite (guard matches the injected shape only)") {
    withProbe("spec_lsh") {
      import graft.functions.VectorFunctions
      val radius = emb
        .where(VectorFunctions.euclidean(col("embedding"),
          typedLit(q0)) < 100.0)
      val df = FlatKnn.search(radius, q0, 5)
      val plan = df.queryExecution.optimizedPlan.toString
      assert(plan.contains("ExistenceJoin"),
        s"radius pre-filter wrongly suppressed the probe:\n$plan")
      // and fixpoint idempotence still holds: exactly ONE probe join
      assert("ExistenceJoin".r.findAllIn(plan).length === 1,
        s"probe stacked more than once:\n$plan")
      df.collect() // sanity: executes
    }
  }

  test("the rewrite leaves non-kNN sorts alone") {
    withProbe("spec_lsh") {
      val plan = spark.read.parquet(s"$sfDir/orders.parquet")
        .orderBy(col("o_totalprice").desc).limit(5)
        .queryExecution.optimizedPlan.toString
      assert(!plan.contains("ExistenceJoin"))
    }
  }

  test("catalog lifecycle: commit auto-registers the artifact, mutation re-pins it, delete deregisters") {
    import graft.catalog.{LibraryCatalog, Models}
    import graft.functions.Embedder
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("ann_probe_cat").toString
    val catalog = new LibraryCatalog(spark, wh)
    val seed = spark.read.parquet(s"$sfDir/documents.parquet")
      .where(col("doc_id") < 50)
      .select(
        concat(lit("c-"), col("doc_id")).as("id"),
        lit("d-0").as("document_id"),
        col("text"))
    catalog.createLibrary("probe_lib", Models.LshIndexer, seed, overwrite = true)
    assert(AnnProbeRule.isRegistered("probe_lib"),
      "createLibrary commit did not register the ANN artifact")
    val qv = Embedder.embedLocal("probe lifecycle query").toSeq
    def probed(k: Int) = withProbe("probe_lib") {
      val df = FlatKnn.search(
        catalog.chunks("probe_lib").select("id", "embedding"),
        qv, k, idCol = "id")
      val plan = df.queryExecution.optimizedPlan.toString
      assert(plan.contains("ExistenceJoin"),
        s"catalog-built library not probe-rewritable without an explicit register call:\n$plan")
      df.collect()
    }
    assert(probed(3).length === 3)
    // mutation re-pins the token to the NEW version's artifact: a chunk
    // added after registration must be findable through the probe (a
    // stale version pin would read the old sig table and miss it)
    catalog.addChunks("probe_lib",
      Seq(("new-1", "d-0", "a freshly added chunk about probe repinning"))
        .toDF("id", "document_id", "text"))
    val qNew = Embedder
      .embedLocal("a freshly added chunk about probe repinning").toSeq
    val hit = withProbe("probe_lib") {
      val df = FlatKnn.search(
        catalog.chunks("probe_lib").select("id", "embedding"),
        qNew, 1, idCol = "id")
      assert(df.queryExecution.optimizedPlan.toString.contains("ExistenceJoin"))
      df.collect()
    }
    assert(hit.head.getAs[String]("id") === "new-1",
      "post-mutation probe missed the newly committed chunk (stale version pin)")
    // an indexer the rule can't probe deregisters on overwrite
    catalog.createLibrary("probe_lib", Models.FlatIndexer, seed, overwrite = true)
    assert(!AnnProbeRule.isRegistered("probe_lib"),
      "flat overwrite left a stale lsh probe registered")
    // ... and deleteLibrary drops the token entirely
    catalog.createLibrary("probe_lib", Models.LshIndexer, seed, overwrite = true)
    assert(AnnProbeRule.isRegistered("probe_lib"))
    catalog.deleteLibrary("probe_lib")
    assert(!AnnProbeRule.isRegistered("probe_lib"),
      "deleteLibrary left the ANN probe token registered")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(wh))
  }

  test("catalog lifecycle: startup recovery (listLibraries) re-registers persisted artifacts") {
    import graft.catalog.{LibraryCatalog, Models}
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("ann_probe_rec").toString
    val c1 = new LibraryCatalog(spark, wh)
    c1.createLibrary("rec_lib", Models.LshIndexer,
      Seq(("r-1", "d-0", "recovery fixture text")).toDF("id", "document_id", "text"))
    AnnProbeRule.deregister("rec_lib") // simulate a fresh process
    assert(!AnnProbeRule.isRegistered("rec_lib"))
    new LibraryCatalog(spark, wh).listLibraries()
    assert(AnnProbeRule.isRegistered("rec_lib"),
      "startup recovery did not re-register the persisted ANN artifact")
    AnnProbeRule.deregister("rec_lib")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(wh))
  }

  test("recovery bindings refresh recovery bindings, never mutation/manual ones") {
    def probe(kind: String) = AnnProbeRule.ArtifactProbe(kind, "id", 8,
      _ => spark.range(0).selectExpr("cast(id as string) id"))
    AnnProbeRule.deregister("rr_tok")
    // unbound -> recovery binds
    assert(AnnProbeRule.registerRecovered("rr_tok", probe("r1")))
    // recovery REFRESHES an earlier recovery (a re-listing after a
    // cross-process version bump must re-pin, not rot on a GC'd version)
    assert(AnnProbeRule.registerRecovered("rr_tok", probe("r2")))
    // a mutation-time registration takes ownership...
    AnnProbeRule.register("rr_tok", probe("m"))
    // ...and recovery can no longer touch it
    assert(!AnnProbeRule.registerRecovered("rr_tok", probe("r3")))
    assert(AnnProbeRule.isRegistered("rr_tok"))
    AnnProbeRule.deregister("rr_tok")
  }

  test("listing is register-only: a read path never deregisters a foreign token") {
    import graft.catalog.{LibraryCatalog, Models}
    import spark.implicits._
    // a FLAT library named like a manually registered probe: commit
    // paths deregister unprobeable indexers, but a mere listLibraries()
    // (read path) must not wipe the token — two catalogs over different
    // warehouses, or a user's manual registration, share the global
    // name-keyed registry
    val wh = java.nio.file.Files.createTempDirectory("ann_probe_ro").toString
    val c = new LibraryCatalog(spark, wh)
    AnnProbeRule.deregister("ro_lib")
    c.createLibrary("ro_lib", Models.FlatIndexer,
      Seq(("r-1", "d-0", "read only fixture text")).toDF("id", "document_id", "text"))
    AnnProbeRule.register("ro_lib",
      AnnProbeRule.ArtifactProbe("manual", "id", 32,
        _ => spark.range(0).selectExpr("cast(id as string) id")))
    new LibraryCatalog(spark, wh).listLibraries()
    assert(AnnProbeRule.isRegistered("ro_lib"),
      "listLibraries() deregistered a manually registered probe token")
    AnnProbeRule.deregister("ro_lib")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(wh))
  }
}
