package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev probe: stage cardinalities + wall time of the prefix-filtered
  * Jaccard join, to attribute its cost at a given sf. */
object JaccardProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[jprobe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val sets = graft.operators.NearDup
      .docShingles(docs, "doc_id", "text",
        graft.operators.NearDup.Params(shingleSize = 3))
      .select(col("doc_id"), col("shingles").as("s"))
    val ex = sets.select(col("doc_id"), size(col("s")).as("n"),
      explode(col("s")).as("g"))
    timed("exploded count")(println("  n=" + ex.count()))
    val freq = ex.groupBy("g").agg(count(lit(1)).as("f"))
    timed("distinct shingles")(println("  n=" + freq.count()))
    timed("top freqs")(freq.orderBy(col("f").desc).limit(5).collect()
      .foreach(r => println("  " + r)))
    val ranked = ex.join(broadcast(freq), "g")
      .withColumn("rn", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("f"), col("g"))))
      .where(col("rn") <= col("n") - expr("(n * 4 + 4) DIV 5") + lit(1))
      .select("doc_id", "n", "g")
    timed("prefix rows")(println("  n=" + ranked.count()))
    val cand = ranked.as("x").join(ranked.as("y"),
        col("x.g") === col("y.g") && col("x.doc_id") < col("y.doc_id") &&
          col("y.n") * 5 >= col("x.n") * 4 && col("x.n") * 5 >= col("y.n") * 4)
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
    timed("cand pre-distinct")(println("  n=" + cand.count()))
    timed("cand distinct")(println("  n=" + cand.distinct().count()))
    timed("full selfJoin")(println("  n=" + graft.operators.JaccardJoin
      .selfJoin(docs, "doc_id", "text", k = 3, tNum = 4, tDen = 5).count()))
    spark.stop()
  }
}
