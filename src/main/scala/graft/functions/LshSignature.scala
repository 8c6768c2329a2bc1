package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Fused codegen expression for one LSH table's sign-bit signature: bit
  * b is set iff dot(vec, planes(b)) >= 0. Replaces `hashSize`
  * zip_with+aggregate compositions (each allocating an intermediate
  * array per row) with one loop over a plane matrix held as a codegen
  * reference object.
  *
  * Bit-identical to the composition form (same float→double casts, same
  * left-to-right accumulation per plane) — asserted in LshIndexSpec.
  * Returns NULL when the vector's length doesn't match the planes' dim,
  * mirroring what zip_with's null-padding does to the built-in form.
  */
case class LshSignature(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression {

  private val dim = planes.headOption.map(_.length).getOrElse(0)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects ARRAY<FLOAT>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "lsh_signature"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != dim) null
    else {
      var sig = 0L
      var b = 0
      while (b < planes.length) {
        val pl = planes(b)
        var dot = 0.0
        var d = 0
        while (d < dim) { dot += v.getFloat(d).toDouble * pl(d); d += 1 }
        if (dot >= 0.0) sig |= 1L << b
        b += 1
      }
      sig
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
      val sig = ctx.freshName("sig")
      val b = ctx.freshName("b")
      val d = ctx.freshName("d")
      val dot = ctx.freshName("dot")
      val pl = ctx.freshName("pl")
      s"""
      |if ($v.numElements() != $dim) { ${ev.isNull} = true; } else {
      |  long $sig = 0L;
      |  for (int $b = 0; $b < ${planes.length}; $b++) {
      |    final double[] $pl = $planesRef[$b];
      |    double $dot = 0.0;
      |    for (int $d = 0; $d < $dim; $d++) {
      |      $dot += (double) $v.getFloat($d) * $pl[$d];
      |    }
      |    if ($dot >= 0.0) $sig |= 1L << $b;
      |  }
      |  ${ev.value} = $sig;
      |}
      |""".stripMargin
    })
}
