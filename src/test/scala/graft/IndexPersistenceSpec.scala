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

  test("persisted probes fall back to the full corpus when candidates < k") {
    // k larger than the whole library: the under-k branch must widen to
    // the corpus (lsh.py:199-202 semantics) through BOTH persisted paths
    val all = catalog.chunks("lib_ivf").count()
    val resIvf = catalog.search("lib_ivf", "zzz nothing matches this", k = all.toInt + 5)
    assert(resIvf.count() === all)
    val resLsh = catalog.search("lib_plsh", "zzz nothing matches this", k = 1000)
    assert(resLsh.count() === catalog.chunks("lib_plsh").count())
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
