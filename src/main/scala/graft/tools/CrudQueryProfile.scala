package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: the EXACT q_crud_pipeline body with a wall-clock per
  * phase, run three times in one session (bench-style min-of-N), so a
  * warm-vs-cold or state-shape regression shows up per phase instead of
  * as one opaque total. Run with
  * `runMain graft.tools.CrudQueryProfile [sfDir]`. */
object CrudQueryProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.catalog.{LibraryCatalog, Models}

    def phase[T](run: Int, name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[qprof] run$run $name%-24s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    val wh = s"/tmp/qprof_${System.nanoTime()}"
    (1 to 3).foreach { run =>
      val cat = new LibraryCatalog(spark, wh)
      val src = spark.read.parquet(s"$dir/documents.parquet").select(
        concat(lit("c"), col("doc_id")).as("id"),
        concat(lit("d"), pmod(col("doc_id"), lit(50))).as("document_id"),
        col("text"),
        struct(
          col("lang").as("source"),
          lit(null).cast("timestamp").as("created_at"),
          array(col("lang")).as("tags"),
          lit(null).cast("string").as("author"),
          lit(null).cast("string").as("title"),
          lit(null).cast("string").as("description"),
          pmod(col("doc_id"), lit(10)).cast("int").as("page")).as("metadata"))
      phase(run, "createLibrary") {
        cat.createLibrary("crud_demo", Models.LshIndexer, src, overwrite = true)
      }
      val extra = spark.range(100).select(
        concat(lit("add"), col("id")).as("id"),
        lit("dadd").as("document_id"),
        concat(lit("synthetic chunk number "), col("id")).as("text"),
        struct(
          lit("synthetic").as("source"),
          lit(null).cast("timestamp").as("created_at"),
          array(lit("synthetic")).as("tags"),
          lit(null).cast("string").as("author"),
          lit(null).cast("string").as("title"),
          lit(null).cast("string").as("description"),
          lit(null).cast("int").as("page")).as("metadata"))
      phase(run, "batch(delete+add)") {
        cat.applyBatch("crud_demo", Seq(
          LibraryCatalog.DeleteChunksWhereOp(col("metadata.page") === 3),
          LibraryCatalog.AddChunksOp(extra)))
      }
      val incremental = cat.indexTable("crud_demo").get
        .select("id", "table_idx", "sig")
      phase(run, "rebuildIndex")(cat.rebuildIndex("crud_demo"))
      val rebuilt = cat.indexTable("crud_demo").get
        .select("id", "table_idx", "sig")
      val signed = incremental.withColumn("__s", lit(1L))
        .unionByName(rebuilt.withColumn("__s", lit(-1L)))
      phase(run, "digest") {
        val aqeKey = "spark.sql.adaptive.enabled"
        val prevAqe = spark.conf.get(aqeKey)
        spark.conf.set(aqeKey, "false")
        try signed
          .agg(
            coalesce(sum(col("__s").cast("decimal(38,0)") *
              xxhash64(col("id"), col("table_idx"), col("sig"))
                .cast("decimal(38,0)")), lit(java.math.BigDecimal.ZERO)).as("h"),
            coalesce(sum(col("__s")), lit(0L)).as("n"))
          .head()
        finally spark.conf.set(aqeKey, prevAqe)
      }
      phase(run, "batch(M4+M6+M7)") {
        cat.applyBatch("crud_demo", Seq(
          LibraryCatalog.UpdateChunkOp("add5",
            newText = Some("updated synthetic chunk number five")),
          LibraryCatalog.UpdateMetadataWhereOp(col("document_id") === "d7",
            struct(
              lit("relabeled").as("source"),
              lit(null).cast("timestamp").as("created_at"),
              array(lit("relabeled")).as("tags"),
              lit(null).cast("string").as("author"),
              lit(null).cast("string").as("title"),
              lit(null).cast("string").as("description"),
              lit(null).cast("int").as("page"))),
          LibraryCatalog.DeleteDocumentOp("d4")))
      }
      phase(run, "recover+aggregate") {
        new LibraryCatalog(spark, wh)
          .chunks("crud_demo")
          .groupBy(col("metadata.source").as("source"))
          .agg(count(lit(1)).as("n"), sum(length(col("text"))).as("sum_len"))
          .collect()
      }
    }
    spark.stop()
  }
}
