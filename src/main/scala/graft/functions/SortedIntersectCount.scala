package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** `|A ∩ B|` of two SORTED-ASCENDING distinct ARRAY<BIGINT> sets as one
  * two-pointer merge walk — the verify kernel of the Jaccard family and
  * the triangle counter.
  *
  * Why not `size(array_intersect(a, b))`: the built-in materializes the
  * intersection ARRAY through a per-row hash set just so `size` can
  * throw both away — per CANDIDATE PAIR, on operators whose candidate
  * count is 10^8 at the ×100 gate (measured there: the intersect term
  * alone was ~48 s of q_ngram_jaccard's 127 s, tools/JaccardShapeAB).
  * The merge walk does zero allocation, zero hashing, and stays inside
  * whole-stage codegen; sort_array on the corpus-linear SET side (docs)
  * is amortized once per document, not per pair.
  *
  * CONTRACT: both inputs sorted ascending with distinct elements (the
  * callers' sets are `sort_array` outputs over `array_distinct`/fused
  * distinct-shingle kernels). On unsorted input the count is an
  * undercount — every caller pins equality against the built-in in its
  * spec, and the DuckDB oracle hash would flag a drift loudly. NULL if
  * either side is NULL (matching `array_intersect`); null ELEMENTS are
  * skipped defensively (the sources never produce them).
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(LongType, _) => true
      case _                      => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two ARRAY<BIGINT> inputs, " +
        s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_count"
  override def nullable: Boolean = true

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val xn = x.numElements()
    val yn = y.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < xn && j < yn) {
      if (x.isNullAt(i)) i += 1
      else if (y.isNullAt(j)) j += 1
      else {
        val xv = x.getLong(i)
        val yv = y.getLong(j)
        if (xv == yv) { c += 1; i += 1; j += 1 }
        else if (xv < yv) i += 1
        else j += 1
      }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val xn = ctx.freshName("xn")
      val yn = ctx.freshName("yn")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
        |final int $xn = $a.numElements();
        |final int $yn = $b.numElements();
        |int $i = 0; int $j = 0; int $c = 0;
        |while ($i < $xn && $j < $yn) {
        |  if ($a.isNullAt($i)) { $i++; }
        |  else if ($b.isNullAt($j)) { $j++; }
        |  else {
        |    final long $xv = $a.getLong($i);
        |    final long $yv = $b.getLong($j);
        |    if ($xv == $yv) { $c++; $i++; $j++; }
        |    else if ($xv < $yv) { $i++; } else { $j++; }
        |  }
        |}
        |${ev.value} = $c;
        |""".stripMargin
    })
}
