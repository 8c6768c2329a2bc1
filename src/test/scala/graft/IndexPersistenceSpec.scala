package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll

import graft.catalog.LibraryCatalog
import graft.catalog.Models._
import graft.operators.{IvfIndex, LshIndex}

/** The persisted-index scale claims, demonstrated on PERSISTED tables —
  * not the inline recompute paths the CORRECTNESS queries also exercise:
  *  - LSH signature table written partitionBy(table_idx): the probe is L
  *    one-partition scans with the sig equality pushed to parquet
  *    (LshIndex.scala scale note).
  *  - IVF assignments written partitionBy(cell): a probe reads nProbe
  *    partition directories, never the corpus (IvfIndex.scala scale
  *    note); centroids ride in their own small table.
  *  - bucketBy(sig) variant: bucket pruning selects 1 of N bucket files.
  */
class IndexPersistenceSpec extends SparkSpec with BeforeAndAfterAll {

  private lazy val warehouse = Files.createTempDirectory("graft-idxwh-").toString
  private lazy val catalog = new LibraryCatalog(spark, warehouse)
  private val sigBucketTable = "graft_bucketed_sig"

  private def corpus(): DataFrame =
    spark.read
      .parquet(s"$sfDir/documents.parquet")
      .where(col("doc_id") < 60)
      .select(
        concat(lit("chunk-"), col("doc_id")).as("id"),
        concat(lit("doc-"), pmod(col("doc_id"), lit(8))).as("document_id"),
        col("text"))

  override def afterAll(): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $sigBucketTable")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(warehouse))
    super.afterAll()
  }

  test("catalog LSH index is laid out partitioned by table_idx on disk") {
    catalog.createLibrary("lib_plsh", LshIndexer, corpus(), overwrite = true)
    val m = catalog.readMeta("lib_plsh").get
    val idxDir = new java.io.File(f"$warehouse/lib_plsh/v${m.version}%06d/index")
    val partDirs = idxDir.listFiles().filter(_.getName.startsWith("table_idx="))
    assert(partDirs.length === LshIndex.Params().numTables,
      s"expected one partition dir per table, got ${partDirs.map(_.getName).toSeq}")
  }

  test("pruned LSH probe: per-table partition filters + sig pushdown, not a corpus scan") {
    val sig = catalog.indexTable("lib_plsh").get
    val qv = catalog
      .chunks("lib_plsh").where(col("id") === "chunk-3")
      .select("embedding").head().getSeq[Float](0).toArray
    val p = LshIndex.Params(dim = qv.length) // catalog planes use the embedder dim
    val querySigs = LshIndex.planes(p).map(LshIndex.signatureLocal(qv, _))
    val plan = LshIndex
      .prunedCandidateIds(sig, querySigs, "id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(table_idx"),
      "probe scans are not partition-pruned on table_idx")
    assert(plan.contains("PushedFilters: [IsNotNull(sig), EqualTo(sig,"),
      "sig equality not pushed to the parquet scan")
    // and the probe is correct: chunk-3's own signature rows match in
    // every table, so chunk-3 must be among the candidate ids
    val ids = LshIndex.prunedCandidateIds(sig, querySigs, "id")
      .collect().map(_.getString(0))
    assert(ids.contains("chunk-3"))
  }

  test("catalog IVF library: cell-partitioned assignments + centroids, pruned probe, exact self-match") {
    catalog.createLibrary("lib_ivf", IvfIndexer, corpus(), overwrite = true)
    val m = catalog.readMeta("lib_ivf").get
    val idxDir = new java.io.File(f"$warehouse/lib_ivf/v${m.version}%06d/index")
    assert(idxDir.listFiles().exists(_.getName.startsWith("cell=")),
      "assignments not partitioned by cell on disk")
    assert(catalog.centroidsTable("lib_ivf").get.count() ===
      IvfIndex.Params().nCells.toLong)

    // probe plan: the assignments scan must carry a cell partition filter
    val asn = catalog.indexTable("lib_ivf").get
    val probePlan = asn.where(col("cell").isin(0, 1))
      .queryExecution.executedPlan.toString
    assert(probePlan.contains("PartitionFilters: [cell"),
      "assignments scan not partition-pruned on cell")

    // end-to-end: self-text search through the catalog's IVF read path
    val text = catalog.chunks("lib_ivf")
      .where(col("id") === "chunk-11").head().getAs[String]("text")
    val res = catalog.search("lib_ivf", text, k = 3).collect()
    assert(res.head.getAs[String]("id") === "chunk-11")
    assert(res.head.getAs[Double]("dist") === 0.0)
  }

  test("IVF incremental add assigns only new rows against FIXED centroids") {
    import spark.implicits._
    val centsBefore = catalog.centroidsTable("lib_ivf").get
      .orderBy("cid").collect().map(_.getSeq[Float](1)).toSeq
    val extra = Seq(("ivf-new", "doc-new", "a brand new chunk about ivf probing"))
      .toDF("id", "document_id", "text")
    catalog.addChunks("lib_ivf", extra)
    val centsAfter = catalog.centroidsTable("lib_ivf").get
      .orderBy("cid").collect().map(_.getSeq[Float](1)).toSeq
    assert(centsBefore === centsAfter, "incremental add must not move centroids")
    assert(catalog.indexTable("lib_ivf").get.where(col("id") === "ivf-new").count() === 1L)
    // the new chunk is reachable through the probe path
    val res = catalog
      .search("lib_ivf", "a brand new chunk about ivf probing", k = 1).head()
    assert(res.getAs[String]("id") === "ivf-new")
  }

  test("rebuildIndex over IVF re-derives centroids and assignments consistently") {
    catalog.rebuildIndex("lib_ivf")
    val asn = catalog.indexTable("lib_ivf").get
    assert(asn.count() === catalog.chunks("lib_ivf").count())
    // every chunk id is assigned exactly once
    assert(asn.groupBy("id").count().where(col("count") =!= 1).isEmpty)
  }

  test("catalog IVF-PQ library: cell-partitioned codes + persisted codebook, cold load ≡ rebuild, pruned probe, self-match") {
    import graft.operators.PqIndex
    catalog.createLibrary("lib_ivfpq", IvfPqIndexer, corpus(), overwrite = true)
    val m = catalog.readMeta("lib_ivfpq").get
    val idxDir = new java.io.File(f"$warehouse/lib_ivfpq/v${m.version}%06d/index")
    assert(idxDir.listFiles().exists(_.getName.startsWith("cell=")),
      "codes not partitioned by cell on disk")

    // cold catalog: codebook and codes load off parquet and are
    // BIT-IDENTICAL to a re-derivation from the chunk corpus
    val cold = new LibraryCatalog(spark, warehouse)
    val p = PqIndex.Params()
    val cbLoaded = PqIndex.codebookOf(cold.codebookTable("lib_ivfpq").get, p)
    val sample = IvfIndex.centroids(
      cold.chunks("lib_ivfpq"), IvfIndex.Params(), "id", "embedding")
    val cbRebuilt = PqIndex.codebookFromSample(sample, p)
    assert(cbLoaded.flatten.flatten.toSeq === cbRebuilt.flatten.flatten.toSeq,
      "persisted codebook != rebuilt codebook")
    val codesLoaded = cold.indexTable("lib_ivfpq").get
      .orderBy("id").collect().map(_.toSeq).toSeq
    val codesRebuilt = PqIndex
      .codesForWrite(cold.chunks("lib_ivfpq"), cbRebuilt, sample, p, "id", "embedding")
      .withColumn("cell", col("cell").cast("int"))
      .orderBy("id").collect().map(_.toSeq).toSeq
    assert(codesLoaded === codesRebuilt, "persisted codes != rebuilt codes")

    // probe plan: the codes scan must carry a cell partition filter
    val probePlan = cold.indexTable("lib_ivfpq").get
      .where(col("cell").isin(0, 1))
      .queryExecution.executedPlan.toString
    assert(probePlan.contains("PartitionFilters: [cell"),
      "codes scan not partition-pruned on cell")

    // end-to-end: self-text search through the catalog's ADC read path
    // (the self vector's ADC score is the global minimum by construction)
    val text = cold.chunks("lib_ivfpq")
      .where(col("id") === "chunk-11").head().getAs[String]("text")
    val res = cold.search("lib_ivfpq", text, k = 3).collect()
    assert(res.head.getAs[String]("id") === "chunk-11")
    assert(res.head.getAs[Double]("dist") === 0.0)
  }

  test("IVF-PQ incremental add encodes only new rows against the FIXED persisted codebook") {
    import spark.implicits._
    val cbBefore = catalog.codebookTable("lib_ivfpq").get
      .orderBy("s", "j").collect().map(_.getSeq[Double](2)).toSeq
    val extra = Seq(("zz-new", "doc-new", "a brand new chunk about pq codes"))
      .toDF("id", "document_id", "text")
    catalog.addChunks("lib_ivfpq", extra)
    val cbAfter = catalog.codebookTable("lib_ivfpq").get
      .orderBy("s", "j").collect().map(_.getSeq[Double](2)).toSeq
    assert(cbBefore === cbAfter, "incremental add must not retrain the codebook")
    assert(catalog.indexTable("lib_ivfpq").get
      .where(col("id") === "zz-new").count() === 1L)
    val res = catalog
      .search("lib_ivfpq", "a brand new chunk about pq codes", k = 1).head()
    assert(res.getAs[String]("id") === "zz-new")
  }

  test("rebuildIndex over IVF-PQ reproduces the incremental codes exactly") {
    val before = catalog.indexTable("lib_ivfpq").get
      .orderBy("id").collect().map(_.toSeq).toSeq
    catalog.rebuildIndex("lib_ivfpq")
    val after = catalog.indexTable("lib_ivfpq").get
      .orderBy("id").collect().map(_.toSeq).toSeq
    // the sample ids ("chunk-*") sort below "zz-new", so the rebuild's
    // re-derived quantizers equal the originals and codes match bitwise
    assert(after === before)
    assert(catalog.indexTable("lib_ivfpq").get.count() ===
      catalog.chunks("lib_ivfpq").count())
  }

  test("persisted probes fall back to the full corpus when candidates < k") {
    // k larger than the whole library: the under-k branch must widen to
    // the corpus (lsh.py:199-202 semantics) through BOTH persisted paths
    val all = catalog.chunks("lib_ivf").count()
    val resIvf = catalog.search("lib_ivf", "zzz nothing matches this", k = all.toInt + 5)
    assert(resIvf.count() === all)
    val resLsh = catalog.search("lib_plsh", "zzz nothing matches this", k = 1000)
    assert(resLsh.count() === catalog.chunks("lib_plsh").count())
  }

  /** Deep graph equality: same nodes, levels, vectors, adjacency (in
    * buffer order), entry point, and next insertion ordinal. */
  private def assertGraphsIdentical(
      a: graft.operators.HnswIndex, b: graft.operators.HnswIndex): Unit = {
    assert(a.entry === b.entry)
    assert(a.nextOrdinal === b.nextOrdinal)
    val (na, nb) = (a.exportNodes, b.exportNodes)
    assert(na.map(_._1) === nb.map(_._1), "node ids / insertion order differ")
    na.zip(nb).foreach { case ((id, va, la, aa), (_, vb, lb, ab)) =>
      assert(va.toSeq === vb.toSeq, s"vector of node $id differs")
      assert(la === lb, s"level of node $id differs")
      assert(aa.map(_.toSeq).toSeq === ab.map(_.toSeq).toSeq,
        s"adjacency of node $id differs")
    }
  }

  test("hnsw graph round-trips through the persisted artifact bit-identically") {
    catalog.createLibrary("lib_phnsw", HnswIndexer, corpus(), overwrite = true)
    val m = catalog.readMeta("lib_phnsw").get
    val vdir = new java.io.File(f"$warehouse/lib_phnsw/v${m.version}%06d")
    assert(new java.io.File(vdir, "hnsw_graph").isDirectory,
      "graph artifact not written at create")
    assert(new java.io.File(vdir, "hnsw_meta").isDirectory,
      "graph meta artifact not written at create")

    // a COLD catalog (fresh instance, empty driver cache) loads the
    // artifact; the loaded graph is bit-identical to a from-scratch
    // rebuild over the same chunks
    val cold = new LibraryCatalog(spark, warehouse)
    val loaded = cold.loadPersistedHnsw("lib_phnsw")
    assert(loaded.isDefined, "cold catalog found no persisted graph")
    val rebuilt = cold.buildHnswGraph(cold.chunks("lib_phnsw")).get
    assert(loaded.get._2 === rebuilt._2, "ordinal→id mapping differs")
    assertGraphsIdentical(loaded.get._1, rebuilt._1)

    // and the search read path off the reloaded catalog is correct:
    // self-text search returns the chunk itself at distance 0
    val text = cold.chunks("lib_phnsw")
      .where(col("id") === "chunk-7").head().getAs[String]("text")
    val res = cold.search("lib_phnsw", text, k = 3).collect()
    assert(res.head.getAs[String]("id") === "chunk-7")
    assert(res.head.getAs[Double]("dist") === 0.0)
  }

  test("hnsw warm read schedules zero jobs; delta drops the artifact; rebuild re-persists") {
    val cold = new LibraryCatalog(spark, warehouse)
    cold.search("lib_phnsw", "warm probe", k = 3) // cold: loads the artifact
    assert(cold.hnswGraphVersionsCached("lib_phnsw") === 1)
    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          s: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      // building the search DataFrame acquires the graph eagerly; with
      // the version cached it must schedule NO Spark job at all
      cold.hnswGraph("lib_phnsw")
      org.apache.spark.graft.ListenerBridge.waitForListenerBus(spark.sparkContext)
      assert(jobs.get() === 0, "warm graph read scheduled Spark jobs")
    } finally spark.sparkContext.removeSparkListener(listener)

    // a delta commit invalidates the persisted graph (refs dropped) …
    import spark.implicits._
    cold.addChunks("lib_phnsw",
      Seq(("hnsw-extra", "doc-x", "a fresh chunk about graph persistence"))
        .toDF("id", "document_id", "text"))
    assert(cold.loadPersistedHnsw("lib_phnsw").isEmpty,
      "delta commit left a stale persisted graph reachable")
    // … search falls back to the lazy rebuild and still finds the new row
    val r = cold.search("lib_phnsw", "a fresh chunk about graph persistence", k = 1).head()
    assert(r.getAs[String]("id") === "hnsw-extra")

    // rebuildIndex re-persists; a fresh catalog loads it and it matches
    // a rebuild over the post-mutation chunks
    cold.rebuildIndex("lib_phnsw")
    val cold2 = new LibraryCatalog(spark, warehouse)
    val reloaded = cold2.loadPersistedHnsw("lib_phnsw")
    assert(reloaded.isDefined, "rebuildIndex did not re-persist the graph")
    val expected = cold2.buildHnswGraph(cold2.chunks("lib_phnsw")).get
    assert(reloaded.get._2 === expected._2)
    assertGraphsIdentical(reloaded.get._1, expected._1)
  }

  test("over-cap hnsw create persists hnsw_parts; redirect probes RESTORED graphs, bit-par with the in-flight build") {
    val capped = new LibraryCatalog(spark, warehouse, hnswMaxRows = 5)
    capped.createLibrary("lib_hparts", HnswIndexer, corpus(), overwrite = true)
    val m = capped.readMeta("lib_hparts").get
    val vdir = new java.io.File(f"$warehouse/lib_hparts/v${m.version}%06d")
    assert(new java.io.File(vdir, "hnsw_parts").isDirectory,
      "over-cap create did not persist the partitioned graph artifact")
    assert(!new java.io.File(vdir, "hnsw_graph").exists(),
      "over-cap create wrote a driver graph anyway")

    // the redirect read path through a COLD catalog: self-text search
    // must surface the chunk itself at distance 0, off the RESTORED
    // persisted graphs (the driver cache stays empty — nothing to cache)
    val cold = new LibraryCatalog(spark, warehouse, hnswMaxRows = 5)
    val text = cold.chunks("lib_hparts")
      .where(col("id") === "chunk-7").head().getAs[String]("text")
    val res = cold.search("lib_hparts", text, k = 3).collect()
    assert(res.head.getAs[String]("id") === "chunk-7")
    assert(math.abs(res.head.getAs[Double]("dist")) < 1e-9)
    assert(cold.hnswGraphVersionsCached("lib_hparts") === 0)

    // artifact-vs-rebuild bit-parity on the redirect path: probing the
    // PERSISTED rows returns exactly what probing freshly-built rows
    // over the same chunks returns (the build-fallback branch)
    val qv = cold.chunks("lib_hparts").where(col("id") === "chunk-7")
      .select("embedding").head().getSeq[Float](0).toArray
    val persisted = spark.read.parquet(new java.io.File(vdir, "hnsw_parts").toString)
    val built = graft.operators.HnswIndex.partitionedGraphRowsKeyed(
      cold.chunks("lib_hparts"), cold.HnswPartsCount, "id", "embedding")
    def probe(rows: org.apache.spark.sql.DataFrame) =
      graft.operators.HnswIndex.probeGraphRowsKeyed(rows, Seq((0L, qv)), 3)
        .orderBy("dist", "id")
        .collect().map(r => (r.getString(1), r.getDouble(2))).toSeq
    assert(probe(persisted) === probe(built),
      "persisted-artifact probe diverges from the in-flight build probe")

    // a delta PATCHES hnsw_parts per-partition (never drops it): the
    // new version's dir holds the rebuilt partitions, the reconciled
    // artifact equals a from-scratch build of the new corpus
    // bit-for-bit, and a cold search uses the artifact — the in-flight
    // fallback must stay untouched
    import spark.implicits._
    cold.addChunks("lib_hparts",
      Seq(("hparts-extra", "doc-x", "an unmistakably unique partitioned probe sentence"))
        .toDF("id", "document_id", "text"))
    val m2 = cold.readMeta("lib_hparts").get
    val vdir2 = new java.io.File(f"$warehouse/lib_hparts/v${m2.version}%06d")
    assert(new java.io.File(vdir2, "hnsw_parts").isDirectory,
      "delta commit did not write the patched hnsw_parts partitions")
    def normalized(df: org.apache.spark.sql.DataFrame): Seq[String] = {
      def norm(v: Any): String = v match {
        case s: scala.collection.Seq[_] => s.map(norm).mkString("[", ",", "]")
        case x => String.valueOf(x)
      }
      df.select("part", "ord", "id", "vec", "level", "nbrs", "entry",
          "m", "efc", "seed", "max_level")
        .collect().map(r => norm(r.toSeq)).sorted.toSeq
    }
    val cold2 = new LibraryCatalog(spark, warehouse, hnswMaxRows = 5)
    val r2 = cold2.search("lib_hparts",
      "an unmistakably unique partitioned probe sentence", k = 1).head()
    assert(r2.getAs[String]("id") === "hparts-extra")
    assert(cold2.hnswPartsFallbacksCached("lib_hparts") === 0,
      "patched artifact present but the cold search took the rebuild fallback")
    assert(
      normalized(cold2.hnswPartsTable("lib_hparts").get) ===
        normalized(graft.operators.HnswIndex.partitionedGraphRowsKeyed(
          cold2.chunks("lib_hparts"), cold2.HnswPartsCount, "id", "embedding")),
      "patched hnsw_parts diverges from a from-scratch build of the new corpus")

    // delete path: tombstones reconcile the removed partitions' old
    // rows away and the patched artifact still equals a fresh build
    cold2.deleteChunks("lib_hparts", Seq("chunk-7"))
    val cold3 = new LibraryCatalog(spark, warehouse, hnswMaxRows = 5)
    val patched3 = normalized(cold3.hnswPartsTable("lib_hparts").get)
    assert(patched3 ===
      normalized(graft.operators.HnswIndex.partitionedGraphRowsKeyed(
        cold3.chunks("lib_hparts"), cold3.HnswPartsCount, "id", "embedding")),
      "post-delete patched hnsw_parts diverges from a from-scratch build")
    assert(!patched3.exists(_.contains("chunk-7")),
      "deleted id still present in the reconciled artifact")
    cold3.deleteLibrary("lib_hparts")
  }

  test("a persisted graph larger than the session cap loads as None and search redirects (no crash)") {
    // a durable warehouse written under a LARGER driver cap must stay
    // searchable from a smaller-capped session: the load falls through
    // to the over-cap redirect instead of require-crashing
    val big = new LibraryCatalog(spark, warehouse, hnswMaxRows = 5000)
    big.createLibrary("lib_legacy", HnswIndexer, corpus(), overwrite = true)
    assert(big.loadPersistedHnsw("lib_legacy").isDefined)

    val small = new LibraryCatalog(spark, warehouse, hnswMaxRows = 5)
    assert(small.loadPersistedHnsw("lib_legacy").isEmpty,
      "over-cap persisted graph should load as None under the smaller cap")
    val text = small.chunks("lib_legacy")
      .where(col("id") === "chunk-7").head().getAs[String]("text")
    val res = small.search("lib_legacy", text, k = 3).collect()
    assert(res.length === 3)
    assert(res.head.getAs[String]("id") === "chunk-7")
    small.deleteLibrary("lib_legacy")
  }

  test("bucketBy(sig) variant: probe selects 1 bucket file set of 8") {
    val sig = catalog.indexTable("lib_plsh").get
    sig
      .repartition(8, col("sig"))
      .write.mode("overwrite")
      .bucketBy(8, "sig").sortBy("sig")
      .saveAsTable(sigBucketTable)
    val someSig = spark.table(sigBucketTable).head().getAs[Long]("sig")
    // SPARK-32859: the planner auto-disables bucketed scans when no
    // join/agg needs the distribution — turn that off so the filter-only
    // probe can exercise bucket PRUNING (the property under test)
    val key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val saved = spark.conf.get(key)
    spark.conf.set(key, "false")
    try {
      val plan = spark.table(sigBucketTable)
        .where(col("sig") === someSig)
        .queryExecution.executedPlan.toString
      assert(plan.contains("Bucketed: true"), "bucketed scan not used")
      assert(plan.contains("SelectedBucketsCount: 1 out of 8"),
        "bucket pruning did not select a single bucket")
    } finally spark.conf.set(key, saved)
  }
}
