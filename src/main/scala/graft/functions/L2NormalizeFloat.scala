package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType}

/** Fused float L2-normalization of an ARRAY<FLOAT> column: one pass for
  * the norm (double, left-to-right), one pass for the scaled copy,
  * zero vectors passed through unchanged — bit-identical to the
  * composed form
  *
  *   when(l2Norm(a) === 0.0, a)
  *     .otherwise(transform(a, x => (x.cast("double") / l2Norm(a)).cast("float")))
  *
  * (asserted in VectorDistanceSpec). The composed form is the
  * q_hnsw_recall exact-side normalizer and it is pathological at scale
  * for the same reason as [[Md5Embed]]'s composition twin, squared:
  * the bound norm is referenced INSIDE the transform lambda, so the
  * full O(dim) aggregate re-evaluates once per ELEMENT (O(dim²) per
  * row), and Spark's higher-order functions evaluate INTERPRETED — no
  * whole-stage codegen. Measured at x100 (200k × 64-dim): 58.6 s for
  * the composed normalize alone vs sub-second fused — it was 89% of
  * q_hnsw_recall's 65.7 s gate row. */
case class L2NormalizeFloat(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName expects ARRAY<FLOAT>, got $other")
  }
  override def dataType: DataType = child.dataType
  override def prettyName: String = "l2_normalize_float"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override protected def nullSafeEval(input: Any): Any =
    L2NormalizeFloat.normalize(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      // Static helper call for the same Janino reason as Md5PrefixInt.
      s"""
      |${ev.value} = graft.functions.L2NormalizeFloat.normalize($v);
      |""".stripMargin)
}

object L2NormalizeFloat {
  /** Shared by interpreted eval and generated code. */
  def normalize(x: ArrayData): ArrayData = {
    val n = x.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) { val v = x.getFloat(i).toDouble; acc += v * v; i += 1 }
    val norm = math.sqrt(acc)
    if (norm == 0.0) x.copy() // zero vector passes through (copy: the input may alias the row buffer)
    else {
      val out = new Array[Float](n)
      i = 0
      while (i < n) { out(i) = (x.getFloat(i).toDouble / norm).toFloat; i += 1 }
      ArrayData.toArrayData(out)
    }
  }
}
