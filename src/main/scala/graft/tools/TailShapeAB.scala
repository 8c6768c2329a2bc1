package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Same-JVM interleaved A/B for the round-17 tail-query fixed-cost work:
  * OLD shape = a separate driver `.head()` action re-running a corpus
  * lineage to inline a literal; NEW shape = the same total as a scalar
  * subquery inside one plan (what SparkEntry ships). Each iteration
  * times a full noop materialization of both shapes for q_token_drift
  * and q_collocations, alternating, so host weather hits both arms
  * equally (cross-run bench medians on this box are unusable —
  * SCALING.md). Also asserts the two shapes' collected results are
  * identical, row for row.
  *
  * Usage: runMain graft.tools.TailShapeAB [sfDir] [iters]
  */
object TailShapeAB {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val iters = if (args.length > 1) args(1).toInt else 5
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .config("spark.hadoop.fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false")
      .appName("tail-shape-ab").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def rn(c: Column, n: Int): Column = round(c, n) + lit(0.0)
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    // ---- q_token_drift, both shapes (the exact shingle kernel the
    // query uses: the fused AllShingles codegen expression)
    def shingles: DataFrame = {
      import org.apache.spark.sql.graft.ColumnBridge
      docs.select(col("source"), explode(ColumnBridge.column(
        graft.functions.AllShingles(
          ColumnBridge.expression(col("text")), 3))).as("shingle"))
    }
    val isA = length(col("source")) === 4
    def driftCounts: DataFrame = shingles
      .groupBy("shingle")
      .agg(
        sum(when(isA, 1L).otherwise(0L)).as("n_a"),
        sum(when(!isA, 1L).otherwise(0L)).as("n_b"))
    def driftOld(): DataFrame = {
      val counts = driftCounts
      val tot = counts.agg(sum("n_a"), sum("n_b")).head()
      val (ta, tb) = (tot.getLong(0).toDouble, tot.getLong(1).toDouble)
      val nab = (col("n_a") + col("n_b")).cast("double")
      val ea = nab * lit(ta) / lit(ta + tb)
      val eb = nab * lit(tb) / lit(ta + tb)
      val da = col("n_a").cast("double") - ea
      val db = col("n_b").cast("double") - eb
      counts.select(col("shingle"), col("n_a"), col("n_b"),
          rn(da * da / ea + db * db / eb, 6).as("chi2"))
        .orderBy((col("n_a") + col("n_b")).desc, col("shingle")).limit(200)
    }
    def driftNew(): DataFrame = {
      val counts = driftCounts
      val tot = counts.agg(
        sum("n_a").cast("double").as("ta"), sum("n_b").cast("double").as("tb"))
      val ta = col("__tot.ta"); val tb = col("__tot.tb")
      val nab = (col("n_a") + col("n_b")).cast("double")
      val ea = nab * ta / (ta + tb)
      val eb = nab * tb / (ta + tb)
      val da = col("n_a").cast("double") - ea
      val db = col("n_b").cast("double") - eb
      counts
        .withColumn("__tot", tot.select(struct(col("ta"), col("tb"))).scalar())
        .select(col("shingle"), col("n_a"), col("n_b"),
          rn(da * da / ea + db * db / eb, 6).as("chi2"))
        .orderBy((col("n_a") + col("n_b")).desc, col("shingle")).limit(200)
    }

    // ---- q_collocations, both shapes
    def tkDf: DataFrame = docs.select(split(col("text"), " ", -1).as("tk"))
    def uniDf: DataFrame = tkDf.select(explode(col("tk")).as("t"))
      .groupBy("t").agg(count(lit(1)).as("c"))
    def bgDf: DataFrame = tkDf.where(size(col("tk")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(tk) - 1), " +
          "i -> named_struct('a', tk[i-1], 'b', tk[i]))")).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
    def collocJoined: DataFrame = {
      val uni = uniDf
      bgDf.groupBy("a", "b").agg(count(lit(1)).as("cab"))
        .join(broadcast(uni.select(col("t").as("a"), col("c").as("ca"))), "a")
        .join(broadcast(uni.select(col("t").as("b"), col("c").as("cb"))), "b")
    }
    def collocOld(): DataFrame = {
      val nTok = tkDf.agg(sum(size(col("tk")))).head().getLong(0)
      collocJoined
        .select(concat(col("a"), lit(" "), col("b")).as("bigram"), col("cab"),
          rn((col("cab") * lit(nTok)).cast("double") /
            (col("ca") * col("cb")).cast("double"), 6).as("lift"))
        .orderBy(col("lift").desc, col("bigram")).limit(20)
    }
    def collocNew(): DataFrame = {
      val tot = uniDf.agg(sum("c").as("n_tok"))
      collocJoined
        .withColumn("__tot", tot.select(struct(col("n_tok"))).scalar())
        .select(concat(col("a"), lit(" "), col("b")).as("bigram"), col("cab"),
          rn((col("cab") * col("__tot.n_tok")).cast("double") /
            (col("ca") * col("cb")).cast("double"), 6).as("lift"))
        .orderBy(col("lift").desc, col("bigram")).limit(20)
    }

    // result equality (once, before timing)
    require(driftOld().collect().toSeq == driftNew().collect().toSeq,
      "token_drift shapes disagree")
    require(collocOld().collect().toSeq == collocNew().collect().toSeq,
      "collocations shapes disagree")
    println("[tailab] result equality: OK (both pairs)")

    def time(f: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val res = scala.collection.mutable.Map[String, Vector[Double]]()
      .withDefaultValue(Vector.empty)
    (1 to iters).foreach { it =>
      for ((name, f) <- Seq(
          "drift_old" -> (driftOld _), "drift_new" -> (driftNew _),
          "colloc_old" -> (collocOld _), "colloc_new" -> (collocNew _))) {
        val s = time(f)
        res(name) = res(name) :+ s
        println(f"[tailab] it=$it $name%-11s $s%.3f s")
      }
    }
    res.toSeq.sortBy(_._1).foreach { case (n, v) =>
      println(f"[tailab] $n%-11s min=${v.min}%.3f median=${v.sorted.apply(v.size / 2)}%.3f")
    }
    spark.stop()
  }
}
