package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: wall-clock each phase of the q_crud_pipeline lifecycle
  * so optimization effort goes where the time is. Run with
  * `runMain graft.tools.CrudProfile [sfDir]`. */
object CrudProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      // local-mode IO floor: RawLocalFileSystem skips the .crc sibling
      // write per file (a real cluster fs has its own integrity story)
      .config("spark.hadoop.fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
      // a 100+-query surface compiles several codegen classes per query;
      // the default 100-entry class cache thrashes and recompiles every
      // re-execution (static conf, must be set before session build)
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.catalog.{LibraryCatalog, Models}

    def phase[T](name: String)(f: => T): T = {
      val st = spark.sparkContext.statusTracker
      val j0 = st.getJobIdsForGroup(null).length
      val t0 = System.nanoTime()
      val r = f
      val dj = st.getJobIdsForGroup(null).length - j0
      println(f"[crudprof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s  $dj%3d jobs")
      r
    }

    val wh = s"/tmp/crudprof_${System.nanoTime()}"
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

    // warm-up once so codegen/classloading doesn't pollute the phases
    phase("warmup-createLibrary") {
      cat.createLibrary("warm", Models.LshIndexer, src, overwrite = true)
    }
    phase("createLibrary") {
      cat.createLibrary("crud_demo", Models.LshIndexer, src, overwrite = true)
    }
    phase("deleteChunksWhere") {
      cat.deleteChunksWhere("crud_demo", col("metadata.page") === 3)
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
    phase("addChunks")(cat.addChunks("crud_demo", extra))
    phase("batch(delete+add) twin") {
      cat.createLibrary("crud_twin", Models.LshIndexer, src, overwrite = true)
      cat.applyBatch("crud_twin", Seq(
        LibraryCatalog.DeleteChunksWhereOp(col("metadata.page") === 3),
        LibraryCatalog.AddChunksOp(extra)))
    }
    val incremental = phase("indexTable-read") {
      cat.indexTable("crud_demo").get.select("id", "table_idx", "sig")
    }
    phase("rebuildIndex")(cat.rebuildIndex("crud_demo"))
    val rebuilt = cat.indexTable("crud_demo").get.select("id", "table_idx", "sig")
    phase("index-diff-count") {
      incremental.withColumn("__s", lit(1L))
        .unionByName(rebuilt.withColumn("__s", lit(-1L)))
        .groupBy("id", "table_idx", "sig")
        .agg(sum("__s").as("__d"))
        .agg(coalesce(sum(abs(col("__d"))), lit(0L)))
        .head().getLong(0)
    }
    phase("index-diff-digest") {
      incremental.withColumn("__s", lit(1L))
        .unionByName(rebuilt.withColumn("__s", lit(-1L)))
        .agg(
          coalesce(sum(col("__s").cast("decimal(38,0)") *
            xxhash64(col("id"), col("table_idx"), col("sig"))
              .cast("decimal(38,0)")), lit(java.math.BigDecimal.ZERO)),
          coalesce(sum(col("__s")), lit(0L)))
        .head()
    }
    phase("applyBatch(M4+M6+M7)") {
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
    phase("recover+aggregate") {
      new LibraryCatalog(spark, wh)
        .chunks("crud_demo")
        .groupBy(col("metadata.source").as("source"))
        .agg(count(lit(1)).as("n"), sum(length(col("text"))).as("sum_len"))
        .collect()
    }
    spark.stop()
  }
}
