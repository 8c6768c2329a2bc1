package graft.tools

import scala.collection.concurrent.TrieMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Stage-level attribution for q_ngram_jaccard's straggler task (the
  * round-15 verdict's #1): [[JaccardSpillProbe]] proved wall time tracks
  * ONE task's duration 1:1 with zero spill, but its listener folds all
  * stages together, so the fix target (candidate join on the hot shingle
  * bucket vs the verify attaches) stayed a guess. This probe prints, per
  * stage of one pass: task count, max/sum task time, and the stage name,
  * so the hot bucket's home stage is named by measurement before the
  * salting change touches it.
  *
  * Usage: runMain graft.tools.JaccardStageProbe [sfDir] [iters]
  */
object JaccardStageProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "target/sf10-synth"
    val iters = if (args.length > 1) args(1).toInt else 2
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false")
      .appName("jaccard-stage-probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // duration alone cannot distinguish CPU-work growth from wait
    // inflation (the round-16 fan-out A/B needed exactly that split):
    // cpu = executorCpuTime, fetch = shuffle-read fetchWaitTime, gc =
    // jvmGCTime. duration - cpu - fetch ≈ scheduler/IO-write/other wait.
    case class St(var n: Int = 0, var maxMs: Long = 0L, var sumMs: Long = 0L,
        var cpuMs: Long = 0L, var fetchMs: Long = 0L, var gcMs: Long = 0L,
        var name: String = "")
    val stages = TrieMap.empty[Int, St]
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val s = stages.getOrElseUpdate(t.stageId, St())
        s.synchronized {
          s.n += 1
          s.sumMs += t.taskInfo.duration
          if (t.taskInfo.duration > s.maxMs) s.maxMs = t.taskInfo.duration
          val m = t.taskMetrics
          if (m != null) {
            s.cpuMs += m.executorCpuTime / 1000000L
            s.fetchMs += m.shuffleReadMetrics.fetchWaitTime
            s.gcMs += m.jvmGCTime
          }
        }
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val s = stages.getOrElseUpdate(e.stageInfo.stageId, St())
        s.name = e.stageInfo.name
      }
    }
    spark.sparkContext.addSparkListener(listener)

    def pass(label: String): Unit = {
      stages.clear()
      System.gc()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries("q_ngram_jaccard")(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(2000) // listener bus drains async
      println(f"[jaccard-stage] $label wall ${dt}%.1f s")
      stages.toSeq.sortBy(-_._2.maxMs).take(12).foreach { case (id, s) =>
        println(f"[jaccard-stage]   stage $id%4d  tasks ${s.n}%4d  max ${s.maxMs / 1000.0}%7.1f s  sum ${s.sumMs / 1000.0}%8.1f s  cpu ${s.cpuMs / 1000.0}%8.1f s  fetch ${s.fetchMs / 1000.0}%7.1f s  gc ${s.gcMs / 1000.0}%6.1f s  ${s.name.take(60)}")
      }
    }

    pass("warm")
    (1 to iters).foreach(i => pass(s"pass$i"))
    spark.stop()
  }
}
