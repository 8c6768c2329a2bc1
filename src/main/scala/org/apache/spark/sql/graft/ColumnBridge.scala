package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 made `Column` independent of
  * catalyst (SPARK-46934) and gated the converters behind
  * `private[sql]`, so custom-Expression libraries host a one-file
  * bridge inside the sql namespace — the standard technique used by
  * open-source Spark extension libraries. This is the ONLY file outside
  * the `graft` package.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** DataFrame over a custom LogicalPlan (Dataset.ofRows is
    * `private[sql]` in Spark 4 — same story as the converters). */
  def ofRows(
      spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Release the materialized blocks behind an (eagerly)
    * `localCheckpoint`ed DataFrame. A checkpointed Dataset's plan is a
    * `LogicalRDD` over the checkpointed internal RDD; dropping the
    * DataFrame reference alone leaves those blocks in the block manager
    * until a driver GC lets ContextCleaner find them — a cache that
    * evicts stale checkpoint entries (e.g. per-version memoizations)
    * must unpersist explicitly or it leaks storage between GCs. No-op
    * on non-checkpointed frames. */
  def unpersistCheckpoint(df: org.apache.spark.sql.DataFrame): Unit =
    df.queryExecution.logical.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }.foreach(_.unpersist(blocking = false))
}
