package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-stress corpus synthesizer: replicates an sf testdata dir K
  * times with key offsets (`args: srcDir destDir K`), producing a
  * larger corpus with the SAME schemas and referential structure —
  * every fact-table key is shifted per replica so joins stay 1:1-ish
  * instead of exploding, while dimension tables (region/nation) are
  * shared, exactly like a real scale-up.
  *
  * Document text gets a per-replica suffix token (replica 0 unchanged)
  * so exact/near-dup pipelines see realistic near-duplicates instead of
  * a degenerate K-way exact-copy corpus; n_chars is recomputed to stay
  * consistent. Embeddings replicate unperturbed (ANN ties break by id).
  *
  * Usage: runMain graft.tools.SynthScale /root/testdata/sf0.1 \
  *   target/sf1-synth 10
  */
object SynthScale {
  def main(args: Array[String]): Unit = {
    val Array(src, dest, kStr) = args
    val k = kStr.toInt
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.hadoop.fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t(name: String): DataFrame = spark.read.parquet(s"$src/$name.parquet")
    // each table lands as ONE plain <name>.parquet FILE (not a Spark
    // part directory) so the DuckDB oracle gate and pyarrow read the
    // synthetic dir exactly like the driver-generated testdata; Spark
    // still parallelizes the read by row-group splits — which requires
    // row groups SMALLER than the scan split size. The default 128 MB
    // parquet block left ×100 documents as ONE 150 MB row group, so
    // every corpus-scan stage in the ×100 gate ran as ONE task with 13
    // empty siblings (round-16 find: the JaccardStageProbe's sum≈max
    // "straggler" stages were exactly these serial scans — an artifact
    // of this writer, not of the engine or the host). 4 MB groups match
    // the ~4 MB splits Spark plans for these file sizes under the
    // default maxPartitionBytes/openCost math (a row group lands in the
    // split holding its midpoint, so groups much larger than the splits
    // leave most splits empty) — one file per table, with the scan
    // parallelism a real multi-file 100 TB table has natively.
    def write(df: DataFrame, name: String): Unit = {
      import org.apache.hadoop.conf.Configuration
      import org.apache.hadoop.fs.Path
      val tmp = s"$dest/_tmp_$name"
      df.coalesce(1).write.mode("overwrite")
        .option("parquet.block.size", (4L * 1024 * 1024).toString)
        .parquet(tmp)
      val fs = new Path(dest).getFileSystem(new Configuration())
      val part = fs.listStatus(new Path(tmp)).map(_.getPath)
        .filter(p => p.getName.startsWith("part-") &&
          p.getName.endsWith(".parquet")).head
      fs.delete(new Path(s"$dest/$name.parquet"), true)
      fs.rename(part, new Path(s"$dest/$name.parquet"))
      fs.delete(new Path(tmp), true)
    }

    /** K offset copies of `df`; each key column shifts by
      * `i * span(key)`. A span is `max(key in ITS OWN table) + 1` and
      * is REUSED for every foreign-key column referencing that table —
      * shifting a PK and its FK by different amounts (per-table maxes)
      * would dangle every replica's references whenever a tail key has
      * no referencing row. */
    def replicate(df: DataFrame, keys: Map[String, Long])(
        perReplica: (DataFrame, Int) => DataFrame = (d, _) => d): DataFrame =
      (0 until k).map { i =>
        val shifted = keys.foldLeft(df) { case (d, (c, span)) =>
          d.withColumn(c, col(c) + lit(i * span))
        }
        perReplica(shifted, i)
      }.reduce(_ unionByName _)

    def span(table: String, key: String): Long =
      t(table).agg(max(col(key))).head().getLong(0) + 1L

    // one span per KEY FAMILY, derived from the owning table and shared
    // with every referencing column
    val custSpan = span("customer", "c_custkey")
    val suppSpan = span("supplier", "s_suppkey")
    val partSpan = span("part", "p_partkey")
    val orderSpan = span("orders", "o_orderkey")
    val eventSpan = span("events", "event_id")
    val userSpan = span("events", "user_id")
    // vec_id is a FOREIGN KEY into documents.doc_id (the RAG/hybrid
    // queries join knn vec_ids to doc_ids), so embeddings shift by the
    // DOCUMENT span — per the key-family rule above
    val docSpan = span("documents", "doc_id")

    // dimension tables: shared, not replicated
    write(t("region"), "region")
    write(t("nation"), "nation")

    write(replicate(t("customer"), Map("c_custkey" -> custSpan))(), "customer")
    write(replicate(t("supplier"), Map("s_suppkey" -> suppSpan))(), "supplier")
    write(replicate(t("part"), Map("p_partkey" -> partSpan))(), "part")
    write(
      replicate(t("orders"),
        Map("o_orderkey" -> orderSpan, "o_custkey" -> custSpan))(),
      "orders")
    write(
      replicate(t("lineitem"),
        Map("l_orderkey" -> orderSpan, "l_partkey" -> partSpan,
          "l_suppkey" -> suppSpan))(),
      "lineitem")
    write(
      replicate(t("events"),
        Map("event_id" -> eventSpan, "user_id" -> userSpan))(),
      "events")
    write(
      replicate(t("documents"), Map("doc_id" -> docSpan)) { (d, i) =>
        if (i == 0) d
        else d
          .withColumn("text", concat(col("text"), lit(s" r$i")))
          .withColumn("n_chars", length(col("text")).cast("long"))
      },
      "documents")
    // Replica embeddings get CONTINUOUS per-replica perturbations
    // (round-13 verdict: exact-copy replica vectors made every x100
    // embedding-family conclusion — near-dup output floors, ANN recall
    // floors — an artifact of the replication scheme instead of a
    // property of the operators). Each replica i > 0 draws a per-vector
    // magnitude eps in [0.0005, 0.04] and a per-component offset
    // uniform in [-eps, eps], both seeded from xxhash64(vec_id, i[, j])
    // so the corpus is bit-reproducible and the DuckDB oracle reads the
    // same floats back off parquet. With dim 64, |offset| ~ 4.6*eps, so
    // same-base replica pairs span cosine ~0.966..0.999997 — a
    // continuous band across any realistic near-dup threshold (0.99
    // keeps ~half), while cross-base pairs stay below ~0.65 (base
    // corpus max pairwise cosine ~0.6). Replica 0 is bit-unperturbed:
    // queries seeded from base rows (queryVec = vec_id 0, k-means seeds
    // vec_id 0..7) keep their exact values.
    write(
      replicate(t("embeddings"), Map("vec_id" -> docSpan)) { (d, i) =>
        if (i == 0) d
        else {
          val eps =
            pmod(xxhash64(lit("veps"), col("vec_id"), lit(i)), lit(1000L))
              .cast("double") / 1000.0 * 0.0395 + 0.0005
          d.withColumn("embedding",
            transform(col("embedding"), (x, j) =>
              (x.cast("double") + eps *
                (pmod(xxhash64(lit("vdim"), col("vec_id"), lit(i), j),
                  lit(20001L)).cast("double") / 10000.0 - 1.0))
                .cast("float")))
        }
      },
      "embeddings")

    println(s"[synth] wrote ${k}x of $src to $dest")
    spark.stop()
  }
}
