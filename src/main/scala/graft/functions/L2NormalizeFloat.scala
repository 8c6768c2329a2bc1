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
  /** Shared by interpreted eval and generated code.
    *
    * Null ELEMENTS follow the composed twin exactly (round-15 advisor:
    * parquet float arrays usually carry containsNull=true, and getFloat
    * on a null slot would have silently read 0.0f): one null element
    * nulls the aggregate norm, `when(null === 0.0, a)` is not-true so
    * the transform branch runs, and x / null nulls EVERY element — so
    * the fused form returns an all-null array of the input's length.
    * Pinned beside the bit-parity test in VectorDistanceSpec. */
  def normalize(x: ArrayData): ArrayData = {
    val n = x.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) {
        return new org.apache.spark.sql.catalyst.util.GenericArrayData(
          new Array[Any](n))
      }
      val v = x.getFloat(i).toDouble; acc += v * v; i += 1
    }
    val norm = math.sqrt(acc)
    if (norm == 0.0) x.copy() // zero vector passes through (copy: the input may alias the row buffer)
    else {
      val out = new Array[Float](n)
      i = 0
      while (i < n) { out(i) = (x.getFloat(i).toDouble / norm).toFloat; i += 1 }
      ArrayData.toArrayData(out)
    }
  }

  /** Double-counts variant shared by [[L2NormalizeCounts]]'s eval and
    * codegen — mirrors `Embedder.LexicalModel.embedLocal`'s normalize
    * tail exactly (zero norm → all-zero floats, NOT passthrough: the
    * input is a counts vector, the output an embedding). */
  def normalizeCounts(x: ArrayData): ArrayData = {
    val n = x.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) { val v = x.getDouble(i); acc += v * v; i += 1 }
    val norm = math.sqrt(acc)
    val out = new Array[Float](n)
    if (norm != 0.0) {
      i = 0
      while (i < n) { out(i) = (x.getDouble(i) / norm).toFloat; i += 1 }
    }
    ArrayData.toArrayData(out)
  }
}

/** [[L2NormalizeFloat]]'s ARRAY<DOUBLE> → ARRAY<FLOAT> sibling for the
  * lexical embedder's counts vector: norm in double (left-to-right),
  * each count scaled and rounded to float, zero vector → all 0.0f
  * (exactly `embedLocal`'s tail). Exists because the composed
  * normalizer spliced the bound norm aggregate into the transform
  * lambda — the same per-element re-evaluation hazard as the float
  * form, on the catalog's lexical ingest path. Bitwise equality with
  * the composed form is spec-pinned (EmbedderSpec). */
case class L2NormalizeCounts(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName expects ARRAY<DOUBLE>, got $other")
  }
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "l2_normalize_counts"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override protected def nullSafeEval(input: Any): Any =
    L2NormalizeFloat.normalizeCounts(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      // Static helper call for the same Janino reason as Md5PrefixInt.
      s"""
      |${ev.value} = graft.functions.L2NormalizeFloat.normalizeCounts($v);
      |""".stripMargin)
}
