package graft

import org.apache.spark.sql.functions._
import graft.operators.Salting

/** Salting must be semantically invisible: salted results equal their
  * unsalted twins exactly; only the shuffle layout changes. */
class SaltingSpec extends SparkSpec {

  private lazy val lineitem = spark.read.parquet(s"$sfDir/lineitem.parquet").cache()
  private lazy val orders = spark.read.parquet(s"$sfDir/orders.parquet").cache()

  test("salted aggregation equals plain aggregation (sum/count/min/max)") {
    val salted = Salting
      .saltedAggregate(
        lineitem,
        Seq("l_returnflag"),
        Seq(
          "qty" -> ("l_quantity", "sum"),
          "n" -> ("l_quantity", "count"),
          "lo" -> ("l_discount", "min"),
          "hi" -> ("l_discount", "max")))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .sortBy(_._1)
    val plain = lineitem
      .groupBy("l_returnflag")
      .agg(
        sum("l_quantity").as("qty"),
        count(lit(1)).as("n"),
        min("l_discount").as("lo"),
        max("l_discount").as("hi"))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .sortBy(_._1)
    // doubles compared with tolerance: the salt changes the partial-sum
    // grouping, so float addition order legitimately differs
    salted.zip(plain).foreach { case (s, p) =>
      assert(s._1 === p._1)
      assert(math.abs(s._2 - p._2) < 1e-6)
      assert(s._3 === p._3)
      assert(s._4 === p._4 && s._5 === p._5)
    }
  }

  test("salted aggregation runs two aggregate phases over the salted key") {
    val plan = Salting
      .saltedAggregate(lineitem, Seq("l_returnflag"), Seq("n" -> ("l_quantity", "count")),
        saltFactor = 8)
      .queryExecution.executedPlan.toString
    assert("HashAggregate".r.findAllIn(plan).length >= 3, "expected salted + final phases")
  }

  test("salted inner join equals plain inner join") {
    val salted = Salting
      .saltedJoin(lineitem, orders, "l_orderkey", "o_orderkey", saltFactor = 8)
      .select("l_orderkey", "l_linenumber", "o_custkey")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .sorted
    val plain = lineitem
      .join(orders, lineitem("l_orderkey") === orders("o_orderkey"))
      .select("l_orderkey", "l_linenumber", "o_custkey")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .sorted
    assert(salted.length === plain.length)
    assert(salted.sameElements(plain))
  }

  test("salted join handles an artificially skewed hot key") {
    import spark.implicits._
    // 50k rows of one hot key + a small dim with that key
    val big = spark.range(50000).select(lit(7L).as("k"), col("id").as("payload"))
      .unionByName(spark.range(100).select((col("id") + 100L).as("k"), col("id").as("payload")))
    val small = Seq((7L, "hot"), (150L, "cold")).toDF("k2", "name")
    val out = Salting.saltedJoin(big, small, "k", "k2", saltFactor = 8)
    assert(out.count() === 50001L) // 50k hot matches + 1 cold match
    assert(out.where(col("name") === "hot").count() === 50000L)
  }

  test("AQE OptimizeSkewedJoin splits the hot partition (the built-in sibling of saltedJoin)") {
    // Why both exist: AQE skew-join splits oversized SHUFFLE PARTITIONS
    // of a sort-merge join at runtime — zero code, the 100 TB default
    // for skewed joins. Salting stays for what AQE cannot split: a
    // single giant GROUP BY key (aggregation state is per-key, not
    // per-partition) and broadcast-ineligible joins whose hot key must
    // be sprayed BEFORE the shuffle. This pins that the built-in path
    // actually fires under skew, so the operators divide the work as
    // documented in Salting's scaladoc.
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled")
    val saved = keys.map(k => k -> conf.getOption(k)).toMap
    conf.set("spark.sql.adaptive.enabled", "true")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32k")
    conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16k")
    conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try {
      // one hot key carrying 100k rows with incompressible payloads
      // (several MB in one reduce partition vs ~100s of KB median)
      // against a dim too large to broadcast under the disabled threshold
      val big = spark.range(150000).select(
        when(col("id") < 100000, lit(7L)).otherwise(col("id")).as("k"),
        md5(col("id").cast("string")).as("payload"))
      val dim = spark.range(300000)
        .select(col("id").as("k2"), md5(col("id").cast("string")).as("v"))
      val joined = big.join(dim, col("k") === col("k2"))
        .agg(count(lit(1)).as("n"), max(length(col("payload"))).as("lp"))
      val n = joined.collect().head.getLong(0)
      assert(n === 150000L)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE skew-join did not fire:\n${plan.take(4000)}")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }

  test("non-decomposable aggregates are rejected loudly") {
    assertThrows[IllegalArgumentException](
      Salting.saltedAggregate(lineitem, Seq("l_returnflag"), Seq("a" -> ("l_quantity", "avg"))))
  }
}
