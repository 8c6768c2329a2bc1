package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: per-stage timing of the q_crud_pipeline steps. */
object CrudProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("crud-probe")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.catalog.{LibraryCatalog, Models}

    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    val stages = new java.util.concurrent.atomic.AtomicInteger()
    val tasks = new java.util.concurrent.atomic.AtomicInteger()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet()
          stages.addAndGet(js.stageInfos.size)
          tasks.addAndGet(js.stageInfos.map(_.numTasks).sum)
        }
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          val ms = (for {
            s <- si.submissionTime; c <- si.completionTime
          } yield c - s).getOrElse(-1L)
          println(f"    stage ${si.stageId}%3d ${ms}%6d ms tasks=${si.numTasks}%4d  ${si.name.take(90)}")
        }
      })

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val (j0, s0, k0) = (jobs.get(), stages.get(), tasks.get())
      val r = f
      Thread.sleep(120) // listener bus is async
      println(f"STAGE $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s" +
        f"  jobs=${jobs.get() - j0}%3d stages=${stages.get() - s0}%3d" +
        f" tasks=${tasks.get() - k0}%5d")
      r
    }

    for (iter <- 1 to 2) {
    println(s"== ITER $iter ==")
    val iterT0 = System.nanoTime()
    val wh = s"/tmp/graft_crudprobe_wh"
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(wh))
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
    timed("createLibrary(lsh)")(
      cat.createLibrary("crud_demo", Models.LshIndexer, src, overwrite = true))
    timed("deleteChunksWhere")(
      cat.deleteChunksWhere("crud_demo", col("metadata.page") === 3))
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
    timed("addChunks")(cat.addChunks("crud_demo", extra))
    val incremental = cat.indexTable("crud_demo").get.select("id", "table_idx", "sig")
    timed("rebuildIndex")(cat.rebuildIndex("crud_demo"))
    val rebuilt = cat.indexTable("crud_demo").get.select("id", "table_idx", "sig")
    timed("index diff")(
      incremental.withColumn("__s", lit(1L))
        .unionByName(rebuilt.withColumn("__s", lit(-1L)))
        .groupBy("id", "table_idx", "sig")
        .agg(sum("__s").as("__d"))
        .agg(coalesce(sum(abs(col("__d"))), lit(0L)))
        .head().getLong(0))
    timed("updateChunk")(
      cat.updateChunk("crud_demo", "add5",
        newText = Some("updated synthetic chunk number five")))
    timed("updateMetadataWhere")(
      cat.updateMetadataWhere("crud_demo", col("document_id") === "d7",
        struct(
          lit("relabeled").as("source"),
          lit(null).cast("timestamp").as("created_at"),
          array(lit("relabeled")).as("tags"),
          lit(null).cast("string").as("author"),
          lit(null).cast("string").as("title"),
          lit(null).cast("string").as("description"),
          lit(null).cast("int").as("page"))))
    timed("deleteDocument")(cat.deleteDocument("crud_demo", "d4"))
    timed("recover+agg")(
      new LibraryCatalog(spark, wh).chunks("crud_demo")
        .groupBy(col("metadata.source")).agg(count(lit(1))).collect())
    println(f"== ITER $iter TOTAL ${(System.nanoTime() - iterT0) / 1e9}%.2f s ==")
    }
    spark.stop()
  }
}
