package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for the four distance metrics — the
  * codegen upgrade SURVEY.md §7.3 plans over the v0 `zip_with` +
  * `aggregate` builders: one fused loop per row, no intermediate array
  * allocation, straight-line generated Java inside whole-stage codegen.
  *
  * Semantics are BIT-IDENTICAL to the built-in compositions in
  * [[VectorFunctions]] (same float→double casts, same left-to-right
  * accumulation order, cosine's zero-magnitude guard evaluated before
  * anything else, `sqrt(na)*sqrt(nb)` not `sqrt(na*nb)`), so swapping
  * them under a query cannot move the DuckDB-oracle hash — asserted
  * bitwise in VectorDistanceSpec and by CORRECTNESS staying green.
  * Mismatched array lengths yield NULL, matching what `zip_with`'s
  * null-padding does to the built-in form.
  */
case class VectorDistance(left: Expression, right: Expression, metricName: String)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) => true
      case _                       => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two ARRAY<FLOAT> inputs, " +
        s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = s"vector_distance_$metricName"

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)

  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val xn = x.numElements()
    val yn = y.numElements()
    metricName match {
      case "cosine" | "cosine_sim" =>
        val sim = metricName == "cosine_sim"
        var na = 0.0
        var i = 0
        while (i < xn) { val v = x.getFloat(i).toDouble; na += v * v; i += 1 }
        var nb = 0.0
        i = 0
        while (i < yn) { val v = y.getFloat(i).toDouble; nb += v * v; i += 1 }
        if (na == 0.0 || nb == 0.0) { if (sim) 0.0 else 1.0 }
        else if (xn != yn) null
        else {
          var dot = 0.0
          i = 0
          while (i < xn) { dot += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
          val q = dot / (math.sqrt(na) * math.sqrt(nb))
          if (sim) q else 1.0 - q
        }
      case _ if xn != yn => null
      case "euclidean" =>
        var s = 0.0
        var i = 0
        while (i < xn) {
          val d = x.getFloat(i).toDouble - y.getFloat(i).toDouble
          s += d * d
          i += 1
        }
        math.sqrt(s)
      case "manhattan" =>
        var s = 0.0
        var i = 0
        while (i < xn) {
          s += math.abs(x.getFloat(i).toDouble - y.getFloat(i).toDouble)
          i += 1
        }
        s
      case "dot_product" =>
        var s = 0.0
        var i = 0
        while (i < xn) { s += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
        -s
      case other => throw new IllegalArgumentException(s"unknown metric: $other")
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val xn = ctx.freshName("xn")
      val yn = ctx.freshName("yn")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val header = s"""
        |final int $xn = $a.numElements();
        |final int $yn = $b.numElements();
        |""".stripMargin
      metricName match {
        case "euclidean" => header + s"""
          |if ($xn != $yn) { ${ev.isNull} = true; } else {
          |  double $acc = 0.0;
          |  for (int $i = 0; $i < $xn; $i++) {
          |    final double $d = (double) $a.getFloat($i) - (double) $b.getFloat($i);
          |    $acc += $d * $d;
          |  }
          |  ${ev.value} = java.lang.Math.sqrt($acc);
          |}
          |""".stripMargin
        case "manhattan" => header + s"""
          |if ($xn != $yn) { ${ev.isNull} = true; } else {
          |  double $acc = 0.0;
          |  for (int $i = 0; $i < $xn; $i++) {
          |    $acc += java.lang.Math.abs((double) $a.getFloat($i) - (double) $b.getFloat($i));
          |  }
          |  ${ev.value} = $acc;
          |}
          |""".stripMargin
        case "dot_product" => header + s"""
          |if ($xn != $yn) { ${ev.isNull} = true; } else {
          |  double $acc = 0.0;
          |  for (int $i = 0; $i < $xn; $i++) {
          |    $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
          |  }
          |  ${ev.value} = -$acc;
          |}
          |""".stripMargin
        case "cosine" | "cosine_sim" =>
          // cosine_sim is the same fused loop emitting dot/(|a||b|)
          // directly (guard -> 0.0): bitwise-equal to the composed
          // cosineSimilarity, which `1 - cosineDistance` would not be.
          val na = ctx.freshName("na")
          val nb = ctx.freshName("nb")
          val dot = ctx.freshName("dot")
          val v = ctx.freshName("v")
          val (guardVal, expr) =
            if (metricName == "cosine_sim")
              ("0.0", s"$dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb))")
            else
              ("1.0", s"1.0 - $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb))")
          header + s"""
          |double $na = 0.0;
          |for (int $i = 0; $i < $xn; $i++) {
          |  final double $v = (double) $a.getFloat($i); $na += $v * $v;
          |}
          |double $nb = 0.0;
          |for (int $i = 0; $i < $yn; $i++) {
          |  final double $v = (double) $b.getFloat($i); $nb += $v * $v;
          |}
          |if ($na == 0.0 || $nb == 0.0) { ${ev.value} = $guardVal; }
          |else if ($xn != $yn) { ${ev.isNull} = true; }
          |else {
          |  double $dot = 0.0;
          |  for (int $i = 0; $i < $xn; $i++) {
          |    $dot += (double) $a.getFloat($i) * (double) $b.getFloat($i);
          |  }
          |  ${ev.value} = $expr;
          |}
          |""".stripMargin
        case other =>
          throw new IllegalArgumentException(s"unknown metric: $other")
      }
    })
}
