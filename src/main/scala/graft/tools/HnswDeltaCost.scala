package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.catalog.LibraryCatalog
import graft.catalog.Models._

/** Measurement probe for the over-cap HNSW delta-mutation path
  * (round-12 verdict #4): create an over-cap library, then time
  *   (1) a COLD search off the persisted hnsw_parts artifact,
  *   (2) a small addChunks delta (which PATCHES the artifact —
  *       O(touched partitions) rebuild + tombstones),
  *   (3) the next COLD search on a FRESH catalog (pre-patch this paid
  *       the full per-partition rebuild fallback, ~21 s at x100).
  * Usage: runMain graft.tools.HnswDeltaCost [sfDir] [deltaRows]
  */
object HnswDeltaCost {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "target/sf1-synth"
    val deltaRows = if (args.length > 1) args(1).toInt else 100
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false")
      .appName("hnsw-delta-cost").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println("[hnsw-delta-cost] %-28s %8.2f s".formatLocal(
        java.util.Locale.ROOT, label, (System.nanoTime() - t0) / 1e9))
      r
    }

    val slug = dir.replaceAll("[^a-zA-Z0-9]", "_")
    val warehouse = s"/tmp/graft_hnswdelta_$slug"
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(warehouse))
    val corpus = spark.read.parquet(s"$dir/documents.parquet")
      .select(
        concat(lit("chunk-"), col("doc_id")).as("id"),
        concat(lit("doc-"), pmod(col("doc_id"), lit(64))).as("document_id"),
        col("text"))
    val nCorpus = corpus.count()
    println(s"[hnsw-delta-cost] corpus=$nCorpus rows, delta=$deltaRows, dir=$dir")

    val cat = new LibraryCatalog(spark, warehouse)
    time("createLibrary (over-cap)") {
      cat.createLibrary("hdc", HnswIndexer, corpus, overwrite = true)
    }
    val probeText = corpus.where(col("id") === "chunk-77")
      .select("text").head().getString(0)
    time("cold search #1 (artifact)") {
      val r = new LibraryCatalog(spark, warehouse).search("hdc", probeText, k = 5)
        .collect()
      require(r.nonEmpty)
    }
    import spark.implicits._
    val delta = (0 until deltaRows)
      .map(i => (s"delta-$i", s"doc-d$i",
        s"a freshly ingested delta document number $i"))
      .toDF("id", "document_id", "text")
    time(s"addChunks ($deltaRows rows, patch)") {
      cat.addChunks("hdc", delta)
    }
    // NOTE: no top-1 identity assertion — the md5 embedder (mirroring
    // the reference's mock) has only 10,000 distinct embedding values
    // (every dim is a function of h mod 10000), so at synthetic scale
    // ANY delta text has ~corpus/10000 exact-collision neighbors whose
    // ids legitimately outrank it under the (dist, id) tie-break.
    // Patch-equals-rebuild identity is IndexPersistenceSpec's job; this
    // tool measures cost and asserts the artifact (not the fallback)
    // served the search and actually contains the delta row.
    time("cold search #2 (post-delta)") {
      val probeN = math.min(3, deltaRows - 1)
      val cold = new LibraryCatalog(spark, warehouse)
      val r = cold.search("hdc",
        s"a freshly ingested delta document number $probeN", k = 5).collect()
      require(r.nonEmpty)
      require(cold.hnswPartsFallbacksCached("hdc") == 0,
        "cold search took the rebuild fallback — patch refs lost")
      require(cold.hnswPartsTable("hdc").get
        .where(col("id") === s"delta-$probeN").count() == 1,
        s"delta-$probeN missing from the reconciled patched artifact")
    }
    time("cold search #3 (warm fs)") {
      val r = new LibraryCatalog(spark, warehouse).search("hdc", probeText, k = 5)
        .collect()
      require(r.nonEmpty)
    }
    spark.stop()
  }
}
