package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Backward as-of join: attach to each left row the single most recent
  * right row (per key) whose timestamp is at-or-before the left row's —
  * the event-stream primitive behind "state as of this event" features
  * (last click before a purchase, last config before a failure, price
  * as of a trade). The reference has no temporal operators; this is
  * part of the training-pipeline surface (feature backfill joins).
  *
  * Spark-first shape: the naive formulation (`l JOIN r ON key AND r.ts
  * <= l.ts` + max-per-group) materializes every (left, earlier-right)
  * pair — quadratic per key, unusable at scale. Instead both sides
  * UNION into one stream tagged by side, one hash shuffle on the key
  * partitions it, and a per-partition sort + running `last(_, ignore
  * nulls)` window carries the latest right payload forward into each
  * left row — O(n log n) per key group, one shuffle total, no pair
  * blowup. Equal timestamps sort the right row first, so a right row at
  * exactly the left timestamp matches (the `>=` convention, same as
  * DuckDB's ASOF JOIN — q_asof_join's oracle is literally `ASOF LEFT
  * JOIN`).
  *
  * Right rows must be unique per (keys, rightTs) — pre-aggregate
  * otherwise (ties would make "the" matched row nondeterministic).
  */
object AsOfJoin {

  /** @param left      any DataFrame; all its columns pass through
    * @param right     must contain exactly `keys`, `rightTs`, and the
    *                  payload columns — pre-project/pre-aggregate it
    * @param keys      equi-join key columns present on both sides
    * @param leftTs    left timestamp column name
    * @param rightTs   right timestamp column name
    * @param rightVals right payload columns to attach (may include
    *                  `rightTs` itself to surface the matched time)
    * @param prefix    prefix for attached columns (`asof_<col>`)
    */
  def asOfBackward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightVals: Seq[String],
      prefix: String = "asof_"): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one key column")
    val leftCols = left.columns.toSeq
    // the matched payload travels as ONE struct so every attached column
    // comes from the SAME right row (per-column running-last would mix
    // rows when payloads contain nulls)
    val rvType = StructType(rightVals.map(c =>
      right.schema(right.schema.fieldIndex(c))))
    val lSide = left.select(
      leftCols.map(col) ++ Seq(
        col(leftTs).as("__ats"),
        lit(1).as("__side"),
        lit(null).cast(rvType).as("__rv")): _*)
    // ASOF semantics treat a NULL timestamp comparison as NO MATCH (the
    // DuckDB oracle's behavior): a null-ts right row can never be "the
    // most recent at-or-before" anything — unfiltered it sorts first
    // under NULLS FIRST and leaks its payload into every left row that
    // has no real match. (Null-ts LEFT rows sort before every right row
    // and correctly surface with a NULL match.)
    val rSide = right.where(col(rightTs).isNotNull).select(
      keys.map(col) ++
        leftCols.filterNot(keys.contains).map(c =>
          lit(null).cast(left.schema(left.schema.fieldIndex(c)).dataType).as(c)) ++
        Seq(
          col(rightTs).as("__ats"),
          lit(0).as("__side"),
          struct(rightVals.map(c => col(c).as(c)): _*).as("__rv")): _*)
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("__ats").asc_nulls_first, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lSide.unionByName(rSide)
      .withColumn("__m", last(col("__rv"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(
        leftCols.map(col) ++
          rightVals.map(c => col(s"__m.$c").as(s"$prefix$c")): _*)
  }

  /** Forward variant: the EARLIEST right row at-or-after the left
    * timestamp (time-to-next-event labels). Same machinery, reversed
    * time order. */
  def asOfForward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightVals: Seq[String],
      prefix: String = "asof_"): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one key column")
    val leftCols = left.columns.toSeq
    val rvType = StructType(rightVals.map(c =>
      right.schema(right.schema.fieldIndex(c))))
    val lSide = left.select(
      leftCols.map(col) ++ Seq(
        col(leftTs).as("__ats"),
        lit(1).as("__side"),
        lit(null).cast(rvType).as("__rv")): _*)
    // null-ts right rows never match (see asOfBackward)
    val rSide = right.where(col(rightTs).isNotNull).select(
      keys.map(col) ++
        leftCols.filterNot(keys.contains).map(c =>
          lit(null).cast(left.schema(left.schema.fieldIndex(c)).dataType).as(c)) ++
        Seq(
          col(rightTs).as("__ats"),
          lit(0).as("__side"),
          struct(rightVals.map(c => col(c).as(c)): _*).as("__rv")): _*)
    // descending time puts LATER rows first, so the running last() seen
    // at a left row is the earliest right row >= it; right still sorts
    // before left at equal timestamps (inclusive match). NULLS FIRST
    // keeps a null-ts LEFT row AHEAD of every right row (a plain desc
    // sorts it last, where it would wrongly pick up the minimum-ts
    // right row as its "next event" instead of a NULL match).
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("__ats").desc_nulls_first, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lSide.unionByName(rSide)
      .withColumn("__m", last(col("__rv"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(
        leftCols.map(col) ++
          rightVals.map(c => col(s"__m.$c").as(s"$prefix$c")): _*)
  }
}
