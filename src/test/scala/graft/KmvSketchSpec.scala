package graft

import org.apache.spark.sql.functions._

import graft.functions.KmvSketch.kmvSketch

/** The native KMV aggregate vs the declarative reference formulation:
  * identical k-min set on duplicate-heavy data, correct truncation,
  * cross-partition merge, and the bounded-shuffle plan shape.
  */
class KmvSketchSpec extends SparkSpec {

  test("kmv sketch == distinct().orderBy.limit(k) on duplicate-heavy data") {
    import spark.implicits._
    // 10k rows over ~700 distinct values, many duplicates of the minima
    val df = spark.range(10000)
      .select((pmod(xxhash64(col("id") % 700), lit(1L << 40))).as("h"))
      .repartition(7) // force a multi-partition merge
    val viaSketch = df.agg(kmvSketch(col("h"), 64).as("ks"))
      .select(explode(col("ks")).as("h")).as[Long].collect().toSeq
    val viaSql = df.distinct().orderBy("h").limit(64).as[Long].collect().toSeq
    assert(viaSketch === viaSql)
  }

  test("fewer distinct values than k returns them all, ascending") {
    import spark.implicits._
    val df = Seq(5L, 3L, 5L, 9L, 3L, 3L).toDF("h").repartition(3)
    val ks = df.agg(kmvSketch(col("h"), 64).as("ks"))
      .select(col("ks")).head().getSeq[Long](0)
    assert(ks === Seq(3L, 5L, 9L))
  }

  test("nulls are ignored; empty input yields an empty sketch") {
    import spark.implicits._
    val ks = Seq[Option[Long]](None, Some(2L), None).toDF("h")
      .agg(kmvSketch(col("h"), 8).as("ks")).head().getSeq[Long](0)
    assert(ks === Seq(2L))
    val empty = spark.range(0).select(col("id").as("h"))
      .agg(kmvSketch(col("h"), 8).as("ks")).head().getSeq[Long](0)
    assert(empty.isEmpty)
  }

  test("plan: partial aggregation before the exchange (k longs per partition, not all distinct hashes)") {
    val plan = spark.range(1000).select(xxhash64(col("id")).as("h"))
      .agg(kmvSketch(col("h"), 16))
      .queryExecution.executedPlan.toString
    // ObjectHashAggregate partial + final around one exchange
    assert("ObjectHashAggregate".r.findAllIn(plan).length >= 2,
      s"no partial sketch aggregation in:\n$plan")
    assert(plan.contains("kmv_sketch"), s"aggregate missing in:\n$plan")
  }
}
