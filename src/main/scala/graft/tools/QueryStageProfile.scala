package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-stage decomposition of named bench queries: wall per pass, and
  * for every stage its task count, duration, and max/sum task time —
  * the "where does a sub-2 s sf0.1 row actually spend its time" probe
  * (round-17: the embed-neardup family runs SLOWER at 32 cores than 8;
  * this separates scheduling/task-launch overhead from compute).
  *
  * Usage: runMain graft.tools.QueryStageProfile <q1,q2,...> [sfDir] [iters] [cores]
  */
object QueryStageProfile {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: QueryStageProfile <q1,..> [sfDir] [iters] [cores]")
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val iters = if (args.length > 2) args(2).toInt else 3
    val cores = if (args.length > 3) args(3) else "32"
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .config("spark.hadoop.fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false")
      .appName("query-stage-profile").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    case class St(id: Int, tasks: Int, durMs: Long, taskSumMs: Long,
        taskMaxMs: Long, name: String, cpuMs: Long = 0, gcMs: Long = 0,
        fetchMs: Long = 0, deserMs: Long = 0)
    case class TA(sum: Long, max: Long, cpu: Long, gc: Long, fetch: Long,
        deser: Long)
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[St]()
    val taskAgg = new java.util.concurrent.ConcurrentHashMap[Int, TA]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val d = Option(e.taskInfo).map(_.duration).getOrElse(0L)
          val m = Option(e.taskMetrics)
          taskAgg.merge(e.stageId,
            TA(d, d,
              m.map(_.executorCpuTime / 1000000L).getOrElse(0L),
              m.map(_.jvmGCTime).getOrElse(0L),
              m.map(_.shuffleReadMetrics.fetchWaitTime).getOrElse(0L),
              m.map(_.executorDeserializeTime).getOrElse(0L)),
            (a, b) => TA(a.sum + b.sum, math.max(a.max, b.max),
              a.cpu + b.cpu, a.gc + b.gc, a.fetch + b.fetch,
              a.deser + b.deser))
        }
        override def onStageCompleted(
            e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val i = e.stageInfo
          val dur = (for { s <- i.submissionTime; c <- i.completionTime }
            yield c - s).getOrElse(-1L)
          val a = taskAgg.getOrDefault(i.stageId, TA(0, 0, 0, 0, 0, 0))
          stages.add(St(i.stageId, i.numTasks, dur, a.sum, a.max,
            i.name.takeWhile(_ != '('), a.cpu, a.gc, a.fetch, a.deser))
        }
      })
    val all = graft.SparkEntry.queries ++ graft.SparkEntry.benchOnlyQueries
    names.foreach { n =>
      (1 to iters).foreach { it =>
        stages.clear(); taskAgg.clear()
        val t0 = System.nanoTime()
        all(n)(spark, dir).write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        org.apache.spark.graft.ListenerBridge.waitForListenerBus(spark.sparkContext)
        val ss = scala.jdk.CollectionConverters.IteratorHasAsScala(
          stages.iterator()).asScala.toSeq.sortBy(_.id)
        val nStages = ss.size
        val nTasks = ss.map(_.tasks).sum
        val stageWall = ss.map(_.durMs).filter(_ > 0).sum / 1e3
        val taskSum = ss.map(_.taskSumMs).sum / 1e3
        println(f"[qstage] $n it=$it cores=$cores wall=$wall%.3f s " +
          f"stages=$nStages tasks=$nTasks stageWallSum=$stageWall%.3f s " +
          f"taskTimeSum=$taskSum%.3f s")
        if (it == iters) ss.foreach(s =>
          println(f"[qstage]   stage=${s.id}%4d tasks=${s.tasks}%3d " +
            f"dur=${s.durMs / 1e3}%7.3f s taskSum=${s.taskSumMs / 1e3}%7.3f " +
            f"taskMax=${s.taskMaxMs / 1e3}%7.3f cpu=${s.cpuMs / 1e3}%7.3f " +
            f"gc=${s.gcMs / 1e3}%6.3f fetch=${s.fetchMs / 1e3}%6.3f " +
            f"deser=${s.deserMs / 1e3}%6.3f  ${s.name}"))
      }
    }
    spark.stop()
  }
}
