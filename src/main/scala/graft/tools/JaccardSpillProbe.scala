package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Discriminator for q_ngram_jaccard's per-execution variance (see
  * SCALING.md round-15): run the query N times in one JVM and print,
  * per pass, the wall time beside the run's total spill bytes and the
  * max single-task duration. If slow passes carry spill (or a long
  * straggler task) and fast passes don't, the mechanism is the
  * unified-memory lottery on the skewed verify stage; if spill is flat
  * across modes, look elsewhere (GC, shuffle-fetch).
  *
  * Usage: runMain graft.tools.JaccardSpillProbe [sfDir] [iters]
  */
object JaccardSpillProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "target/sf10-synth"
    val iters = if (args.length > 1) args(1).toInt else 4
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false")
      .appName("jaccard-spill-probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    @volatile var spillMem = 0L
    @volatile var spillDisk = 0L
    @volatile var maxTaskMs = 0L
    @volatile var gcMs = 0L
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          spillMem += m.memoryBytesSpilled
          spillDisk += m.diskBytesSpilled
          gcMs += m.jvmGCTime
          val d = t.taskInfo.duration
          if (d > maxTaskMs) maxTaskMs = d
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    def pass(label: String): Unit = {
      spillMem = 0L; spillDisk = 0L; maxTaskMs = 0L; gcMs = 0L
      System.gc()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries("q_ngram_jaccard")(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      // listener events drain async; give the bus a beat before reading
      Thread.sleep(2000)
      println(f"[jaccard-spill] $label%-6s wall ${dt}%7.1f s  spillMem ${spillMem / (1 << 20)}%6d MB  spillDisk ${spillDisk / (1 << 20)}%6d MB  maxTask ${maxTaskMs / 1000.0}%6.1f s  gc ${gcMs / 1000.0}%6.1f s")
    }

    pass("warm")
    (1 to iters).foreach(i => pass(s"pass$i"))
    spark.stop()
  }
}
