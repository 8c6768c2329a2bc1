package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by salting — the manual escape hatch for the hot-key
  * shapes AQE's skew-join handling doesn't cover (single giant GROUP BY
  * key; a broadcast-ineligible join with one pathological key).
  *
  * - [[saltedAggregate]]: two-phase aggregation. Phase 1 aggregates on
  *   (keys, salt) so a hot key's rows split across `saltFactor`
  *   reducers; phase 2 combines the partials per key. Only decomposable
  *   aggregates (sum/count/min/max) qualify — avg must be expressed as
  *   sum/count by the caller.
  * - [[saltedJoin]]: replicate the SMALL side `saltFactor`× (explode
  *   over salt ids), salt the big side's key by row hash, join on
  *   (key, salt). The hot key's probe rows now land on `saltFactor`
  *   tasks instead of one.
  *
  * Both are semantically invisible (asserted equal to their unsalted
  * forms in SaltingSpec); their only effect is the shuffle layout.
  */
object Salting {

  /** Deterministic-enough per-row salt in [0, n): hash of the whole row
    * partition offset. Any spray works — re-aggregation makes the
    * assignment invisible. */
  private def salt(n: Int): Column =
    pmod(xxhash64(monotonically_increasing_id(), spark_partition_id()), lit(n.toLong))

  /** Two-phase salted aggregation. `aggs` maps output column name →
    * (input column, op) with op ∈ sum|count|min|max. */
  def saltedAggregate(
      df: DataFrame,
      keys: Seq[String],
      aggs: Seq[(String, (String, String))],
      saltFactor: Int = 16): DataFrame = {
    def phase1(op: String, in: String): Column = op match {
      case "sum"   => sum(in)
      case "count" => count(lit(1))
      case "min"   => min(in)
      case "max"   => max(in)
      case other   => throw new IllegalArgumentException(s"non-decomposable agg: $other")
    }
    // phase-2 combiner for each op (count partials combine by SUM)
    def phase2(op: String, partial: String): Column = op match {
      case "sum" | "count" => sum(partial)
      case "min"           => min(partial)
      case "max"           => max(partial)
      case other           => throw new IllegalArgumentException(other)
    }
    val partial = df
      .withColumn("__salt", salt(saltFactor))
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(
        aggs.head match { case (out, (in, op)) => phase1(op, in).as(s"__p_$out") },
        aggs.tail.map { case (out, (in, op)) => phase1(op, in).as(s"__p_$out") }: _*)
    partial
      .groupBy(keys.map(col): _*)
      .agg(
        aggs.head match { case (out, (_, op)) => phase2(op, s"__p_$out").as(out) },
        aggs.tail.map { case (out, (_, op)) => phase2(op, s"__p_$out").as(out) }: _*)
  }

  /** Salted equi-join: big side salted by row hash, small side
    * replicated saltFactor times. Join type inner or left_outer (from
    * the big side's perspective). */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      bigKey: String,
      smallKey: String,
      saltFactor: Int = 16,
      joinType: String = "inner"): DataFrame = {
    val saltedBig = big.withColumn("__salt", salt(saltFactor))
    val replicatedSmall = small
      .withColumn("__salt", explode(sequence(lit(0L), lit(saltFactor.toLong - 1L))))
    saltedBig
      .join(
        replicatedSmall,
        saltedBig(bigKey) === replicatedSmall(smallKey) &&
          saltedBig("__salt") === replicatedSmall("__salt"),
        joinType)
      .drop("__salt")
  }
}
