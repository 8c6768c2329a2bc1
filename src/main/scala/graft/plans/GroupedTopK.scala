package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graft.ColumnBridge

/** Grouped top-k as a first-class operator: LogicalPlan node →
  * SparkStrategy → partial/final physical pair — the whole-operator
  * Catalyst extension path (the ANN rule covers `Rule[LogicalPlan]`;
  * this covers custom planning + execution).
  *
  * Spark's idiomatic per-group top-k is `row_number().over(Window
  * .partitionBy(keys).orderBy(...)) <= k`: one hash exchange of EVERY
  * row plus a full per-partition SORT of every group — O(n log n) per
  * group, all n rows shuffled. This operator is the grouped analog of
  * `TakeOrderedAndProject`: a PARTIAL stage keeps a bounded k-heap per
  * key inside each input partition (no sort, O(n log k), and at most
  * partitions × keys × k rows survive), the exchange moves only those
  * survivors, and a FINAL stage re-heaps per key. At 100 TB with
  * k ≪ rows-per-group the shuffle shrinks by rows/(partitions·k) and
  * the full sort disappears — the same reason Spark plans global top-k
  * as TakeOrdered instead of Sort+Limit.
  *
  * Semantics: keep each group's k smallest rows by `(orderCol, tieCol)`
  * — descending flips `orderCol` only. `orderCol`/`tieCol` must be
  * LongType (the API wrapper casts); output row order within a group is
  * unspecified, as with any unsorted relational result. Ties beyond k
  * cut deterministically on `tieCol`, so results are reproducible for a
  * total (orderCol, tieCol) order regardless of partitioning.
  *
  * Memory model: the per-key heap map does NOT spill — each task holds
  * (keys-in-partition × k) retained rows. That is the operator's
  * contract (same as any sketch/top-k accumulator): it assumes bounded
  * group cardinality per partition; for unbounded key domains at scale,
  * pre-partition by key so each task sees a bounded slice, or fall back
  * to the window formulation. The contract is ENFORCED, not just
  * documented: a task whose retained rows would exceed `maxRetained`
  * (default [[GroupedTopK.DefaultMaxRetainedRowsPerTask]]) fails loudly
  * with the remediation in the message instead of creeping toward an
  * unattributable executor OOM.
  */
case class GroupedTopK(
    keys: Seq[String],
    orderCol: String,
    descending: Boolean,
    tieCol: String,
    k: Int,
    maxRetained: Int,
    child: LogicalPlan)
  extends UnaryNode {
  require(k > 0, "k must be positive")
  require(maxRetained >= k, "maxRetained must be at least k")
  override def output: Seq[Attribute] = child.output
  // keys/order/tie live as STRINGS, so the default (expression-derived)
  // references is empty and ColumnPruning would push a Project below
  // that drops them; declare the whole child output referenced — the
  // operator passes every column through anyway
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    child.outputSet
  override protected def withNewChildInternal(newChild: LogicalPlan): GroupedTopK =
    copy(child = newChild)
}

object GroupedTopK {

  /** Per-task retained-row ceiling (keys-in-partition × k) before the
    * operator refuses: ~8.4M UnsafeRows is comfortably inside a normal
    * executor heap slice, and a workload legitimately above it should be
    * pre-partitioned by key (or use the window formulation) rather than
    * ride an unspillable accumulator. */
  val DefaultMaxRetainedRowsPerTask: Int = 1 << 23

  /** Public API: each group's top-k rows. Installs the planner strategy
    * on first use (idempotent). Long-castable order/tie columns only —
    * the cast happens here so the physical operator can read fixed-width
    * longs without per-row type dispatch. */
  def topKPerGroup(
      df: DataFrame,
      keys: Seq[String],
      orderCol: String,
      k: Int,
      descending: Boolean = false,
      tieCol: String,
      maxRetained: Int = DefaultMaxRetainedRowsPerTask): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.exists(_.isInstanceOf[GroupedTopKStrategy.type]))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ GroupedTopKStrategy
    val typed = df
      .withColumn(orderCol, col(orderCol).cast("long"))
      .withColumn(tieCol, col(tieCol).cast("long"))
    ColumnBridge.ofRows(spark,
      GroupedTopK(keys, orderCol, descending, tieCol, k, maxRetained,
        typed.queryExecution.analyzed))
  }
}

object GroupedTopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case g: GroupedTopK =>
      def attr(n: String): Attribute = g.child.output.filter(_.name == n) match {
        case Seq(one) => one
        case Seq() => throw new IllegalArgumentException(
          s"GroupedTopK: column $n not in ${g.child.output.map(_.name)}")
        case many => throw new IllegalArgumentException(
          s"GroupedTopK: column name $n is ambiguous (${many.size} attributes " +
            "match, e.g. after a self-join) — disambiguate with aliases first")
      }
      val keys = g.keys.map(attr)
      val partial = GroupedTopKExec(
        keys, attr(g.orderCol), g.descending, attr(g.tieCol), g.k,
        g.maxRetained, isFinal = false, planLater(g.child))
      GroupedTopKExec(
        keys, attr(g.orderCol), g.descending, attr(g.tieCol), g.k,
        g.maxRetained, isFinal = true, partial) :: Nil
    case _ => Nil
  }
}

/** Physical bounded-heap top-k per key. The partial instance runs on
  * whatever partitioning the child has; the final instance declares
  * `ClusteredDistribution(keys)` and lets EnsureRequirements insert the
  * one hash exchange — over partial survivors only. */
case class GroupedTopKExec(
    keys: Seq[Expression],
    order: Expression,
    descending: Boolean,
    tie: Expression,
    k: Int,
    maxRetained: Int,
    isFinal: Boolean,
    child: SparkPlan)
  extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def nodeName: String =
    if (isFinal) "GroupedTopKFinal" else "GroupedTopKPartial"
  override def requiredChildDistribution: Seq[Distribution] =
    if (isFinal) Seq(ClusteredDistribution(keys)) else Seq(UnspecifiedDistribution)
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override protected def withNewChildInternal(newChild: SparkPlan): GroupedTopKExec =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val ordExprs = Seq(order, tie)
    val childOutput = child.output
    val desc = descending
    val kk = k
    // bounded-group-cardinality contract, enforced: creating a key
    // beyond this many per task would exceed the retained-row ceiling
    val maxKeys = math.max(1, maxRetained / kk)
    child.execute().mapPartitions ({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ordProj = UnsafeProjection.create(ordExprs, childOutput)
      // NULL discipline matches the window formulation this operator
      // substitutes for (Spark defaults: asc = NULLS FIRST, desc =
      // NULLS LAST; the tie column always asc = NULLS FIRST). Each sort
      // value is a (class, value) pair — reading getLong on a null slot
      // would silently rank nulls as 0 among real values. Keep-order
      // entries are (oCls, oVal, tCls, tVal, row); the heap is a
      // max-heap under keep-order, head = worst retained row.
      def oCls(isNull: Boolean): Int =
        if (desc) { if (isNull) 1 else 0 } // nulls LAST among desc values
        else { if (isNull) 0 else 1 }      // nulls FIRST among asc values
      def keepCompare(
          aoc: Int, aov: Long, atc: Int, atv: Long,
          boc: Int, bov: Long, btc: Int, btv: Long): Int = {
        // class comparison is asc in both directions by construction
        // (the class encodes where nulls sort for this direction)
        var c = Integer.compare(aoc, boc)
        if (c == 0 && aoc == oCls(isNull = false))
          c = if (desc) java.lang.Long.compare(bov, aov)
              else java.lang.Long.compare(aov, bov)
        if (c == 0) c = Integer.compare(atc, btc)
        if (c == 0 && atc == 1) c = java.lang.Long.compare(atv, btv)
        c
      }
      type Entry = (Int, Long, Int, Long, InternalRow)
      val cmp: Ordering[Entry] = new Ordering[Entry] {
        override def compare(a: Entry, b: Entry): Int =
          keepCompare(a._1, a._2, a._3, a._4, b._1, b._2, b._3, b._4)
      }
      val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[Entry]]
      iter.foreach { row =>
        val o = ordProj(row)
        val oc = oCls(o.isNullAt(0))
        val oVal = if (o.isNullAt(0)) 0L else o.getLong(0)
        val tc = if (o.isNullAt(1)) 0 else 1 // tie: asc, nulls first
        val tVal = if (o.isNullAt(1)) 0L else o.getLong(1)
        // probe with the projection's reused buffer; copy the key only
        // when it is actually inserted
        val key = keyProj(row)
        val heap = heaps.get(key) match {
          case Some(h) => h
          case None =>
            if (heaps.size >= maxKeys)
              throw new IllegalStateException(
                s"GroupedTopK: a task saw more than $maxKeys distinct keys " +
                  s"(retained-row ceiling $maxRetained at k=$kk). The per-key " +
                  "heap accumulator does not spill — pre-partition the input " +
                  "by key so each task holds a bounded slice, raise " +
                  "maxRetained deliberately, or use the window formulation " +
                  "for unbounded key domains")
            val h = mutable.PriorityQueue.empty[Entry](cmp)
            heaps.put(key.copy(), h)
            h
        }
        if (heap.size < kk) {
          heap.enqueue((oc, oVal, tc, tVal, row.copy()))
        } else {
          val worst = heap.head
          if (keepCompare(oc, oVal, tc, tVal,
              worst._1, worst._2, worst._3, worst._4) < 0) {
            heap.dequeue()
            heap.enqueue((oc, oVal, tc, tVal, row.copy()))
          }
        }
      }
      heaps.valuesIterator.flatMap(_.iterator.map(_._5))
    }, preservesPartitioning = true)
  }
}
