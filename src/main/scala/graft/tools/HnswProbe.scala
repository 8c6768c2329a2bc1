package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.HnswIndex

/** Scratch probe: measure driver-local and partitioned HNSW recall vs the
  * exact normalized-euclidean top-k at a given sf dir. */
object HnswProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("hnsw-probe")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    println(s"n = ${emb.count()}, partitions = ${emb.rdd.getNumPartitions}")
    val qv = emb.where(col("vec_id") === 0).select("embedding").head().getSeq[Float](0).toArray

    // exact top-10 by euclidean over L2-normalized vectors
    def norm(v: Array[Float]): Array[Float] = {
      val n = math.sqrt(v.map(x => x.toDouble * x).sum)
      if (n == 0) v else v.map(x => (x / n).toFloat)
    }
    val nq = norm(qv)
    val all = emb.select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), norm(r.getSeq[Float](1).toArray)))
    def dist(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i).toDouble - b(i); s += d * d; i += 1 }
      math.sqrt(s)
    }
    val exact = all.map { case (id, v) => (id, dist(nq, v)) }
      .sortBy(t => (t._2, t._1)).take(10)
    println("exact:       " + exact.map(t => s"${t._1}:${"%.6f".format(t._2)}").mkString(" "))

    // explicit whole-corpus envelope: this tool MEASURES the driver-local
    // path (recall + bit-parity vs exact), so it deliberately builds past
    // the auto-redirect knee that fromDataFrame's default would refuse
    val idx = HnswIndex.fromDataFrame(emb, maxRows = 2000000)
    val local = idx.search(qv, 10)
    println("hnsw-local:  " + local.map(t => s"${t._1}:${"%.6f".format(t._2)}").mkString(" "))
    println("local recall = " + local.map(_._1).toSet.intersect(exact.map(_._1).toSet).size / 10.0)

    val part = HnswIndex.searchPartitioned(emb, Seq((0L, qv)), 10)
      .orderBy("dist", "id").collect().map(r => (r.getLong(1), r.getDouble(2)))
    println("hnsw-part:   " + part.map(t => s"${t._1}:${"%.6f".format(t._2)}").mkString(" "))
    println("part recall = " + part.map(_._1).toSet.intersect(exact.map(_._1).toSet).size / 10.0)

    // repartition to force multi-partition builds, check layout independence
    val part8 = HnswIndex.searchPartitioned(emb.repartition(8), Seq((0L, qv)), 10)
      .orderBy("dist", "id").collect().map(r => (r.getLong(1), r.getDouble(2)))
    println("part8 recall = " + part8.map(_._1).toSet.intersect(exact.map(_._1).toSet).size / 10.0)
    // bit-parity of distances vs exact
    println("local bit-parity = " + local.zip(exact).forall { case ((i1, d1), (i2, d2)) =>
      i1 == i2 && java.lang.Double.doubleToLongBits(d1) == java.lang.Double.doubleToLongBits(d2) })
    spark.stop()
  }
}
