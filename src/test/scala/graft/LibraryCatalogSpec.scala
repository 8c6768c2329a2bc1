package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll

import graft.catalog.LibraryCatalog
import graft.catalog.Models._
import graft.functions.VectorFunctions.Cosine

/** Persistence + CRUD semantics (reference: library.py save/load
  * round-trip, chunk_service/document_service mutations, and the
  * 467-LoC tests/test_library_save_load.py suite).
  */
class LibraryCatalogSpec extends SparkSpec with BeforeAndAfterAll {

  private lazy val warehouse =
    Files.createTempDirectory("graft-wh-").toString
  private lazy val catalog = new LibraryCatalog(spark, warehouse)

  /** 40 deterministic chunks across 8 documents, built from real
    * sf0.001 document text (no embeddings — the catalog must compute
    * them). */
  private def corpus(): DataFrame = {
    spark.read
      .parquet(s"$sfDir/documents.parquet")
      .where(col("doc_id") < 40)
      .select(
        concat(lit("chunk-"), col("doc_id")).as("id"),
        concat(lit("doc-"), pmod(col("doc_id"), lit(8))).as("document_id"),
        col("text"),
        struct(
          col("source"),
          lit(null).cast("timestamp").as("created_at"),
          array(col("lang"), col("lang"), lit("all")).as("tags"), // dup tag on purpose
          lit(null).cast("string").as("author"),
          lit(null).cast("string").as("title"),
          lit(null).cast("string").as("description"),
          lit(null).cast("int").as("page")).as("metadata"))
  }

  override def afterAll(): Unit = {
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(warehouse))
    super.afterAll()
  }

  test("hnsw graph cache holds at most one version per library across a mutation burst") {
    catalog.createLibrary("lib_hcache", HnswIndexer, corpus(), overwrite = true)
    catalog.search("lib_hcache", "cache probe", 3).collect()
    assert(catalog.hnswGraphVersionsCached("lib_hcache") === 1)
    (1 to 3).foreach { i =>
      catalog.addChunks("lib_hcache",
        corpus().limit(1)
          .withColumn("id", lit(s"hc-extra-$i"))
          .withColumn("document_id", lit("hc-doc")))
      catalog.search("lib_hcache", "cache probe", 3).collect()
    }
    // 4 versions were built and searched; superseded graphs were evicted
    assert(catalog.hnswGraphVersionsCached("lib_hcache") === 1)
    catalog.deleteLibrary("lib_hcache")
  }

  test("quantizer cache memoizes per version and evicts superseded versions") {
    catalog.createLibrary("lib_qcache", IvfPqIndexer, corpus(), overwrite = true)
    assert(catalog.quantizerVersionsCached("lib_qcache") === 0,
      "registration must build closures only — no quantizer collect at commit")
    val r1 = catalog.search("lib_qcache", "cache probe", 3).collect()
    assert(r1.nonEmpty)
    assert(catalog.quantizerVersionsCached("lib_qcache") === 1)
    (1 to 3).foreach { i =>
      catalog.addChunks("lib_qcache",
        corpus().limit(1)
          .withColumn("id", lit(s"qc-extra-$i"))
          .withColumn("document_id", lit("qc-doc")))
      assert(catalog.search("lib_qcache", "cache probe", 3).collect().nonEmpty)
    }
    // 4 versions searched; stale quantizers evicted on access
    assert(catalog.quantizerVersionsCached("lib_qcache") === 1)
    catalog.deleteLibrary("lib_qcache")
  }

  test("AutoBuckets falls back to a fixed count for stats-less (LogicalRDD) inputs") {
    // createDataFrame(rdd, schema) yields a LogicalRDD whose size stat is
    // the defaultSizeInBytes sentinel (Long.MaxValue); taken literally it
    // would lock this 3-row library to the 65536-bucket clamp for life
    val small = corpus().limit(3)
    val rddDf = spark.createDataFrame(
      spark.sparkContext.parallelize(small.collect().toSeq), small.schema)
    val m = catalog.createLibrary("lib_rddstats", FlatIndexer, rddDf, overwrite = true)
    assert(m.buckets === 8) // FallbackBuckets, not the MaxAutoBuckets clamp
    assert(catalog.chunks("lib_rddstats").count() === 3L)
    catalog.deleteLibrary("lib_rddstats")
  }

  test("strict mutation 404 parity: unknown chunk/document deletes raise, lenient stays a no-op") {
    catalog.createLibrary("lib_404", FlatIndexer, corpus(), overwrite = true)
    // lenient (default, matches the repo's historical semantics): no-op
    catalog.deleteChunks("lib_404", Seq("nope-1"))
    catalog.deleteDocument("lib_404", "no-such-doc")
    assert(catalog.chunks("lib_404").count() === 40L)
    // strict (chunk_service.py:193-217 / document_service.py:77-80
    // parity): raises and publishes nothing
    val e1 = intercept[NoSuchElementException](
      catalog.deleteChunks("lib_404", Seq("chunk-1", "nope-2"), strict = true))
    assert(e1.getMessage.contains("chunk not found"))
    assert(catalog.chunks("lib_404").count() === 40L)
    val e2 = intercept[NoSuchElementException](
      catalog.deleteDocument("lib_404", "no-such-doc", strict = true))
    assert(e2.getMessage.contains("document not found"))
    // strict deletes whose targets all exist proceed normally
    catalog.deleteChunks("lib_404", Seq("chunk-1"), strict = true)
    assert(catalog.chunks("lib_404").count() === 39L)
    catalog.deleteDocument("lib_404", "doc-2", strict = true)
    assert(catalog.chunks("lib_404")
      .where(col("document_id") === "doc-2").count() === 0L)
    catalog.deleteLibrary("lib_404")
  }

  test("M1: createLibrary persists, embeds, and normalizes (P6 tag dedup, created_at fill)") {
    catalog.createLibrary("lib_a", FlatIndexer, corpus(), overwrite = true)
    val loaded = catalog.chunks("lib_a").cache()
    assert(loaded.count() === 40L)
    assert(loaded.where(col("embedding").isNull).count() === 0L)
    // P6: the duplicated lang tag was deduped on ingest
    assert(loaded.where(size(col("metadata.tags")) =!= 2).count() === 0L)
    // created_at was defaulted
    assert(loaded.where(col("metadata.created_at").isNull).count() === 0L)
    loaded.unpersist()
  }

  test("S3/S4: a fresh catalog instance recovers the library from disk") {
    val fresh = new LibraryCatalog(spark, warehouse)
    val metas = fresh.listLibraries()
    assert(metas.map(_.name).contains("lib_a"))
    assert(fresh.chunks("lib_a").count() === 40L)
    assert(metas.find(_.name == "lib_a").get.indexer === FlatIndexer)
  }

  test("derived documents view counts chunks per document (A2) with document fields") {
    val docs = catalog.documents("lib_a").collect()
    assert(docs.length === 8)
    assert(docs.map(_.getAs[Long]("chunk_count")).sum === 40L)
    // document-level fields derive from chunk metadata (documentSchema):
    // tags = sorted distinct union; every doc here carries "all"
    docs.foreach { d =>
      val tags = d.getAs[scala.collection.Seq[String]]("tags")
      assert(tags.contains("all"), s"doc ${d.getAs[String]("id")} tags: $tags")
      assert(tags === tags.sorted.distinct)
      val ids = d.getAs[scala.collection.Seq[String]]("chunk_ids")
      assert(ids === ids.sorted)
    }
  }

  test("search returns k results with text/metadata payload; self-text ranks first") {
    val someText = catalog
      .chunks("lib_a").where(col("id") === "chunk-7").head().getAs[String]("text")
    val res = catalog.search("lib_a", someText, k = 5).collect()
    assert(res.length === 5)
    assert(res.head.getAs[String]("id") === "chunk-7") // self-match at dist 0
    assert(math.abs(res.head.getAs[Double]("dist")) < 1e-9)
  }

  test("P3: projection flags toggle metadata/embedding columns") {
    val both = catalog.search("lib_a", "probe", 3,
      includeMetadata = true, includeEmbeddings = true)
    val neither = catalog.search("lib_a", "probe", 3,
      includeMetadata = false, includeEmbeddings = false)
    assert(both.columns.contains("metadata") && both.columns.contains("embedding"))
    assert(!neither.columns.contains("metadata") && !neither.columns.contains("embedding"))
  }

  test("P1/T4: conjunctive tag post-filter applies AFTER top-k and may return < k") {
    val all = catalog.search("lib_a", "probe", k = 5).count()
    val filtered = catalog
      .search("lib_a", "probe", k = 5, filterTags = Seq("nonexistent-tag"))
      .count()
    assert(all === 5L)
    assert(filtered === 0L) // every candidate filtered out — quirk preserved
  }

  test("K5 quirk: rank metric stays euclidean under strictParity, score uses requested") {
    val strict = catalog.search("lib_a", "probe", 5, metric = Cosine).collect()
    // dist column is euclidean (unbounded), score is cosine (in [0,2])
    assert(strict.forall(r => r.getAs[Double]("score") <= 2.0 + 1e-9))
    val honored = catalog
      .search("lib_a", "probe", 5, metric = Cosine, strictParity = false)
      .collect()
    assert(honored.forall(r => r.getAs[Double]("dist") <= 2.0 + 1e-9))
  }

  test("M2/M3: addChunks appends and is immediately searchable") {
    import spark.implicits._
    val extra = Seq(
      ("added-1", "doc-extra", "a wholly new chunk about spark catalyst"),
      ("added-2", "doc-extra", "another new chunk about shuffles"))
      .toDF("id", "document_id", "text")
    catalog.addChunks("lib_a", extra)
    assert(catalog.chunks("lib_a").count() === 42L)
    val hit = catalog
      .search("lib_a", "a wholly new chunk about spark catalyst", k = 1)
      .head()
    assert(hit.getAs[String]("id") === "added-1")
  }

  test("M4: updateChunk re-embeds on text change and preserves created_at") {
    def createdAt() = catalog
      .chunks("lib_a")
      .where(col("id") === "added-2")
      .select(col("metadata.created_at"))
      .head()
      .getTimestamp(0)
    val beforeCreated = createdAt()
    catalog.updateChunk("lib_a", "added-2", newText = Some("totally different text"))
    val after = catalog.chunks("lib_a").where(col("id") === "added-2").head()
    assert(after.getAs[String]("text") === "totally different text")
    assert(createdAt() === beforeCreated)
    // re-embedded to match the new text
    val hit = catalog.search("lib_a", "totally different text", k = 1).head()
    assert(hit.getAs[String]("id") === "added-2")
    assert(catalog.chunks("lib_a").count() === 42L)
  }

  test("M5: deleteChunks removes rows; M7: deleteDocument cascades") {
    catalog.deleteChunks("lib_a", Seq("added-1"))
    assert(catalog.chunks("lib_a").where(col("id") === "added-1").isEmpty)
    catalog.deleteDocument("lib_a", "doc-extra") // removes added-2
    assert(catalog.chunks("lib_a").where(col("document_id") === "doc-extra").isEmpty)
    assert(catalog.chunks("lib_a").count() === 40L)
  }

  test("LSH-indexed library: index table persists, probe search works after reload") {
    catalog.createLibrary("lib_lsh", LshIndexer, corpus(), overwrite = true)
    val fresh = new LibraryCatalog(spark, warehouse)
    assert(fresh.indexTable("lib_lsh").isDefined)
    assert(fresh.indexTable("lib_lsh").get.count() === 40L * 10) // rows × tables
    val someText = fresh
      .chunks("lib_lsh").where(col("id") === "chunk-3").head().getAs[String]("text")
    val res = fresh.search("lib_lsh", someText, k = 3).collect()
    assert(res.nonEmpty)
    assert(res.head.getAs[String]("id") === "chunk-3")
  }

  test("LSH incremental add maintains the signature table without rebuild") {
    import spark.implicits._
    val extra = Seq(("lsh-new", "doc-0", "incrementally indexed chunk"))
      .toDF("id", "document_id", "text")
    catalog.addChunks("lib_lsh", extra)
    assert(catalog.indexTable("lib_lsh").get.count() === 41L * 10)
    assert(catalog.indexTable("lib_lsh").get.where(col("id") === "lsh-new").count() === 10L)
  }

  test("M6: updateMetadataWhere bulk-replaces metadata, preserves created_at, keeps index") {
    import org.apache.spark.sql.functions.{struct => fstruct}
    val before = catalog.indexTable("lib_lsh").map(_.count())
    val createdBefore = catalog.chunks("lib_lsh")
      .where(col("id") === "chunk-3").select("metadata.created_at").head().getTimestamp(0)
    val newMeta = fstruct(
      lit("bulk-updated").as("source"),
      lit(null).cast("timestamp").as("created_at"),
      array(lit("retagged")).as("tags"),
      lit("author-x").as("author"),
      lit(null).cast("string").as("title"),
      lit(null).cast("string").as("description"),
      lit(null).cast("int").as("page"))
    catalog.updateMetadataWhere("lib_lsh", col("document_id") === "doc-3", newMeta)
    val updated = catalog.chunks("lib_lsh").where(col("document_id") === "doc-3")
    assert(updated.where(col("metadata.source") =!= "bulk-updated").isEmpty)
    val others = catalog.chunks("lib_lsh").where(col("document_id") =!= "doc-3")
    assert(others.where(col("metadata.source") === "bulk-updated").isEmpty)
    // created_at preserved through the bulk replace
    assert(catalog.chunks("lib_lsh")
      .where(col("id") === "chunk-3").select("metadata.created_at").head().getTimestamp(0)
      === createdBefore)
    // index carried forward untouched (embeddings unchanged)
    assert(catalog.indexTable("lib_lsh").map(_.count()) === before)
  }

  test("updateLibrary renames and replaces tags, preserving created_at (PUT /libraries)") {
    catalog.createLibrary("lib_ren", FlatIndexer, corpus(), overwrite = true)
    val created = catalog.readMeta("lib_ren").get.createdAt
    catalog.updateLibrary("lib_ren",
      newName = Some("lib_renamed"), newTags = Some(Seq("test", "flat", "updated")))
    assert(!catalog.exists("lib_ren"))
    val fresh = new LibraryCatalog(spark, warehouse) // recovery sees the move
    val m = fresh.readMeta("lib_renamed").get
    assert(m.tags === Seq("test", "flat", "updated"))
    assert(m.createdAt === created)
    assert(fresh.chunks("lib_renamed").count() === 40L) // data rode along
    // renaming onto an existing library refuses
    fresh.createLibrary("lib_other", FlatIndexer, corpus(), overwrite = true)
    intercept[IllegalStateException] {
      fresh.updateLibrary("lib_renamed", newName = Some("lib_other"))
    }
    fresh.deleteLibrary("lib_renamed")
    fresh.deleteLibrary("lib_other")
  }

  test("M8: deleteLibrary removes it from disk and the listing") {
    catalog.createLibrary("lib_tmp", FlatIndexer, corpus(), overwrite = true)
    assert(catalog.exists("lib_tmp"))
    catalog.deleteLibrary("lib_tmp")
    assert(!catalog.exists("lib_tmp"))
    assert(!catalog.listLibraries().exists(_.name == "lib_tmp"))
  }

  test("M9: rebuildIndex reproduces the incremental signature table exactly") {
    // select by name: the partitioned write moves table_idx (the
    // partition column) to the end of the read-back schema
    val before = catalog.indexTable("lib_lsh").get
      .select("id", "table_idx", "sig")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).sortBy(_.toString)
    catalog.rebuildIndex("lib_lsh")
    val after = catalog.indexTable("lib_lsh").get
      .select("id", "table_idx", "sig")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).sortBy(_.toString)
    assert(before.sameElements(after))
  }

  test("version GC: on-disk dirs are exactly the live set; full commits compact") {
    // v2 delta commits legitimately keep every dir referenced by the
    // current or previous manifest (in-flight readers of v-1 stay whole);
    // anything else is garbage and must be gone.
    val dir = new java.io.File(s"$warehouse/lib_lsh")
    def versionsOnDisk: Set[String] =
      dir.listFiles().map(_.getName).filter(_.startsWith("v")).toSet
    def refsIn(f: java.io.File): Set[String] =
      if (!f.exists()) Set.empty
      else {
        val src = scala.io.Source.fromFile(f, "UTF-8")
        try src.getLines()
          .filter(_.contains("="))
          .flatMap(_.split("=", 2)(1).split(",")).filter(_.nonEmpty).toSet
        finally src.close()
      }
    // live = chunk-manifest refs + index-artifact refs of a version
    def refs(vname: String): Set[String] =
      refsIn(new java.io.File(dir, s"$vname/manifest.txt")) ++
        refsIn(new java.io.File(dir, s"$vname/artifacts.txt"))
    val cur = versionsOnDisk.max // zero-padded names sort numerically
    val prev = f"v${cur.drop(1).toLong - 1}%06d"
    val live = refs(cur) ++ refs(prev) + cur + prev
    val onDisk = versionsOnDisk
    assert(onDisk.subsetOf(live),
      s"unreferenced versions on disk: ${(onDisk -- live).mkString(",")}")
    // a rebuild compacts the INDEX refs to itself but carries the chunk
    // manifest forward — every version a manifest references stays live
    // (a rebuild must never rewrite the corpus); the GC invariant is
    // "on-disk ⊆ live", not a fixed count
    catalog.rebuildIndex("lib_lsh")
    val cur2 = versionsOnDisk.max
    assert(refsIn(new java.io.File(dir, s"$cur2/artifacts.txt")) === Set(cur2),
      "rebuild must compact index refs to itself")
    val prev2 = f"v${cur2.drop(1).toLong - 1}%06d"
    val live2 = refs(cur2) ++ refs(prev2) + cur2 + prev2
    assert(versionsOnDisk.subsetOf(live2),
      s"unreferenced versions on disk: ${(versionsOnDisk -- live2).mkString(",")}")
  }

  test("T5: flat search builds its plan without launching a counting job") {
    // the old implementation ran projected.count() inside search() — the
    // whole embed→scan→distance→top-k executed TWICE per call. Now the
    // under-k warning rides on observe(), so constructing the search
    // DataFrame must launch zero Spark jobs.
    @volatile var jobs = 0
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val df = catalog.search("lib_a", "driver side laziness probe", k = 3)
      Thread.sleep(500) // listener bus is async
      assert(jobs === 0, "search() must not execute anything eagerly")
      assert(df.count() === 3L)
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("hnsw over-cap redirect: search transparently takes the partitioned path, deterministic, no driver graph") {
    // the 100 TB contract: a library grown past the driver-graph cap
    // keeps the SAME search() surface — candidates come from the
    // distributed per-partition graph path instead of a driver collect
    val capped = new LibraryCatalog(spark, warehouse, hnswMaxRows = 5)
    capped.createLibrary("lib_hnsw_cap", HnswIndexer, corpus(), overwrite = true)
    val someText = capped.chunks("lib_hnsw_cap")
      .where(col("id") === "chunk-7").select("text").head().getString(0)
    def run() = capped.search("lib_hnsw_cap", someText, k = 3).collect()
    val r1 = run()
    assert(r1.length === 3, s"redirected search returned ${r1.length} of 3")
    // embedding is a pure function of text, so the exact-text query's
    // own chunk must rank first at distance ~0 through the redirect
    assert(r1.head.getAs[String]("id") === "chunk-7",
      s"redirect missed the exact-text chunk: ${r1.map(_.getAs[String]("id")).toSeq}")
    assert(math.abs(r1.head.getAs[Double]("dist")) < 1e-9)
    // deterministic for the pinned version: a second call is identical
    val r2 = run()
    assert(r1.map(r => (r.getAs[String]("id"), r.getAs[Double]("dist"))).toSeq ===
      r2.map(r => (r.getAs[String]("id"), r.getAs[Double]("dist"))).toSeq,
      "redirected search is not deterministic across calls")
    // and the redirect never memoized a driver-local graph
    assert(capped.hnswGraphVersionsCached("lib_hnsw_cap") === 0,
      "over-cap search built a driver-local graph anyway")
    // the internal driver-graph surface still refuses loudly (it has no
    // graph to return), naming the automatic redirect
    val ex = intercept[IllegalArgumentException] {
      capped.hnswGraph("lib_hnsw_cap")
    }
    assert(ex.getMessage.contains("redirect"))
    capped.deleteLibrary("lib_hnsw_cap")
  }

  test("ingest validation: blank text rows are dropped (chunk.py:55-61)") {
    import spark.implicits._
    val mixed = Seq(
      ("b-1", "doc-b", "valid text"),
      ("b-2", "doc-b", "   "),
      ("b-3", "doc-b", "")).toDF("id", "document_id", "text")
    catalog.createLibrary("lib_blank", FlatIndexer, mixed, overwrite = true)
    assert(catalog.chunks("lib_blank").count() === 1L)
    catalog.deleteLibrary("lib_blank")
  }

  test("per-library bucket count persists and every mutation agrees on it") {
    catalog.createLibrary("lib_b3", LshIndexer, corpus(), overwrite = true,
      numBuckets = 3)
    // the choice survives the meta round-trip AND a fresh catalog
    assert(catalog.readMeta("lib_b3").get.buckets === 3)
    val fresh = new LibraryCatalog(spark, warehouse)
    assert(fresh.readMeta("lib_b3").get.buckets === 3)
    // on-disk layout has at most 3 bucket dirs
    val libRoot = new java.io.File(s"$warehouse/lib_b3")
    val bucketDirs = libRoot.listFiles().filter(_.getName.startsWith("v"))
      .flatMap(v => Option(new java.io.File(v, "chunks").listFiles()).getOrElse(Array.empty))
      .map(_.getName).filter(_.startsWith("__b=")).distinct
    assert(bucketDirs.nonEmpty && bucketDirs.length <= 3, bucketDirs.mkString(","))
    // a point mutation through the FRESH catalog (different instance,
    // same persisted bucket count) still finds and rewrites the row
    fresh.updateChunk("lib_b3", "chunk-7", newText = Some("rebucketed text"))
    val got = fresh.chunks("lib_b3").where(col("id") === "chunk-7")
      .select("text").head().getString(0)
    assert(got === "rebucketed text")
    assert(fresh.chunks("lib_b3").count() === 40L)
    catalog.deleteLibrary("lib_b3")
  }

  test("AutoBuckets sizes the layout from input stats (one bucket at KB scale)") {
    // default numBuckets = AutoBuckets: a KB-scale corpus must get ONE
    // bucket — per-file overhead is the whole cost of a small commit —
    // while the explicit count above (lib_b3) stays honored verbatim
    catalog.createLibrary("lib_auto", FlatIndexer, corpus(), overwrite = true)
    assert(catalog.readMeta("lib_auto").get.buckets === 1)
    val libRoot = new java.io.File(s"$warehouse/lib_auto")
    val bucketDirs = libRoot.listFiles().filter(_.getName.startsWith("v"))
      .flatMap(v => Option(new java.io.File(v, "chunks").listFiles()).getOrElse(Array.empty))
      .map(_.getName).filter(_.startsWith("__b=")).distinct
    assert(bucketDirs.sameElements(Array("__b=0")), bucketDirs.mkString(","))
    // the single-bucket library still serves reads and point mutations
    catalog.updateChunk("lib_auto", "chunk-3", newText = Some("autobucket text"))
    assert(catalog.chunks("lib_auto").where(col("id") === "chunk-3")
      .select("text").head().getString(0) === "autobucket text")
    assert(catalog.chunks("lib_auto").count() === 40L)
    catalog.deleteLibrary("lib_auto")
  }
}
