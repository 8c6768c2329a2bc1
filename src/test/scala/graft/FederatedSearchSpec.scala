package graft

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll

import graft.catalog.{LibraryCatalog, Models}

/** Federated multi-library search across HETEROGENEOUS index kinds —
  * the realistic multi-tenant deployment: one query fans out to shards
  * that each picked their own indexer (lsh / ivf / hnsw), each shard
  * answers through its own PERSISTED artifact's pruned probe, and the
  * global top-k merges k rows per shard (exact by decomposition). The
  * spec pins that federation does not silently degrade any shard to a
  * corpus scan: the LSH shard's plan reads its table_idx-partitioned
  * signature artifact, the IVF shard its cell-partitioned assignments,
  * and the HNSW shard's graph candidates reach the chunk scan as a
  * pushed In(id, …) filter. */
class FederatedSearchSpec extends SparkSpec with BeforeAndAfterAll {

  private val warehouse =
    java.nio.file.Files.createTempDirectory("fed_hetero").toString
  private val query = "climate adaptation for coastal agriculture"

  override def beforeAll(): Unit = {
    super.beforeAll()
    val boot = new LibraryCatalog(spark, warehouse)
    def src(m: Int) = spark.read.parquet(s"$sfDir/documents.parquet")
      .where(pmod(col("doc_id"), lit(3)) === m)
      .select(
        concat(lit("c"), col("doc_id")).as("id"),
        concat(lit("d"), pmod(col("doc_id"), lit(50))).as("document_id"),
        col("text"))
    boot.createLibrary("fs_lsh", Models.LshIndexer, src(0), overwrite = true)
    boot.createLibrary("fs_ivf", Models.IvfIndexer, src(1), overwrite = true)
    boot.createLibrary("fs_hnsw", Models.HnswIndexer, src(2), overwrite = true)
  }

  override def afterAll(): Unit = {
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(warehouse))
    super.afterAll()
  }

  // every search goes through a FRESH catalog: the probes must come from
  // the persisted artifacts, not driver memory
  private def cold = new LibraryCatalog(spark, warehouse)

  private val shards = Seq("fs_lsh", "fs_ivf", "fs_hnsw")

  test("every shard's probe stays artifact-pruned under federation (no shard degrades to a corpus scan)") {
    val cat = cold
    val plans = shards.map(n =>
      n -> cat.search(n, query, k = 3).queryExecution.executedPlan.toString).toMap
    // LSH and IVF shards materialize their PRUNED candidate base
    // (localCheckpoint) before the exact re-rank, so the probe branch
    // having been taken shows as an ExistingRDD rank base with NO
    // parquet scan of the shard's chunks — the under-k fallback would
    // rank the raw chunks read instead
    Seq("fs_lsh", "fs_ivf").foreach { n =>
      assert(plans(n).contains("Scan ExistingRDD"),
        s"$n did not rank over the materialized candidate base:\n${plans(n)}")
      assert(!plans(n).contains(s"/$n/"),
        s"$n fell back to a corpus scan under federation:\n${plans(n)}")
    }
    // …and the candidate plans those checkpoints ran ARE the pruned
    // artifact probes: L one-partition signature scans for lsh, the
    // nProbe-cell partition-pruned assignments read for ivf (built here
    // exactly as the catalog's candidateBase builds them)
    val qvL = graft.functions.Embedder.embedLocal(query, 32)
    val sigProbe = graft.operators.LshIndex.prunedCandidateIds(
      cat.indexTable("fs_lsh").get,
      graft.operators.LshIndex.planes(graft.operators.LshIndex.Params(dim = 32))
        .map(graft.operators.LshIndex.signatureLocal(qvL, _)),
      idCol = "id").queryExecution.executedPlan.toString
    assert(sigProbe.contains("PartitionFilters: [isnotnull(table_idx"),
      s"lsh artifact probe not partition-pruned:\n$sigProbe")
    val cents = graft.operators.IvfIndex.centroidsOf(cat.centroidsTable("fs_ivf").get)
    val probed = graft.operators.IvfIndex
      .probeCells(qvL.toSeq, cents, graft.operators.IvfIndex.Params().nProbe)
      .map(_.toInt)
    val asnProbe = cat.indexTable("fs_ivf").get
      .where(col("cell").isin(probed: _*)).select("id")
      .queryExecution.executedPlan.toString
    assert(asnProbe.contains("PartitionFilters: [cell"),
      s"ivf artifact probe not partition-pruned:\n$asnProbe")
    // HNSW shard: graph candidates reach the chunk scan as a pushed
    // In(id, …) — the corpus is filtered at the source, not post-scan
    assert(plans("fs_hnsw").contains("PushedFilters: [In(id"),
      s"hnsw candidates not pushed into the scan:\n${plans("fs_hnsw")}")
    // and no shard's plan ranks the OTHER shards' data
    shards.foreach { n =>
      val others = shards.filterNot(_ == n)
      assert(!others.exists(o => plans(n).contains(s"/$o/")),
        s"$n's plan reads another shard's data:\n${plans(n)}")
    }
  }

  test("the federated merge is exact by decomposition: global top-k == merge of per-shard top-ks") {
    val cat = cold
    val per = shards.map { n =>
      cat.search(n, query, k = 3)
        .select(lit(n).as("library"), col("id"), col("dist"))
    }
    val fed = per.reduce(_ unionByName _)
      .orderBy(col("dist"), col("id")).limit(3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    // independent driver-side merge of the same per-shard results
    val expect = shards.flatMap { n =>
      cat.search(n, query, k = 3).collect()
        .map(r => (n, r.getAs[String]("id"), r.getAs[Double]("dist")))
    }.sortBy(t => (t._3, t._2)).take(3)
    assert(fed.toSeq === expect)
    assert(fed.length === 3)
    // the merge actually spans shards' own data: every returned id
    // belongs to the shard that reported it
    fed.foreach { case (lib, id, _) =>
      val m = id.stripPrefix("c").toLong % 3
      val owner = shards(m.toInt)
      assert(owner === lib, s"id $id reported by $lib but belongs to $owner")
    }
  }
}
