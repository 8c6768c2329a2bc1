package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Runtime exchange-reuse reporter (round 16): static
  * `explain("formatted")` shows a self-join's subtree duplicated per
  * side, but AQE dedupes exchanges at STAGE CREATION — so "does the
  * prefix pipeline run twice?" can only be answered from the final
  * adaptive plan of an EXECUTED Dataset (`df.collect()` executes the
  * Dataset's own QueryExecution; `df.write...` plans a separate one
  * whose executedPlan never runs AQE). This probe prints the final
  * plan's ReusedExchange count and the per-operator duplication that
  * REMAINS (work sitting between a reused exchange and its consumers
  * re-executes per consumer — the Sort+Window rank pass the round-16
  * prefixesOf rewrite removed was exactly that).
  *
  * Usage: runMain graft.tools.ReuseProbe [sfDir]
  */
object ReuseProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false").appName("reuse-probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val df = graft.operators.JaccardJoin.selfJoin(docs, "doc_id", "text", 3, 4, 5)
    println("rows=" + df.collect().length)
    val s = df.queryExecution.executedPlan.toString
    def n(p: String) = p.r.findAllIn(s).size
    println(s"reusedExchange=${n("ReusedExchange")} " +
      s"shuffleStages=${n("ShuffleQueryStage")} " +
      s"sort=${n("\\+- \\*?\\(?[0-9]*\\)? ?Sort ")} " +
      s"window=${n("Window \\[")} " +
      s"objHashAgg=${n("ObjectHashAggregate")}")
    println(s)
    spark.stop()
  }
}
