package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Fused codegen kernel for one Lloyd assignment step: `[best_cid,
  * best_dist]` over a centroid matrix held as a codegen reference
  * object. Replaces K zip_with+aggregate compositions (each allocating
  * an intermediate array per row, all interpreted — higher-order
  * functions never enter whole-stage codegen) with one branch-free
  * double loop per row; at corpus scale the assignment is the per-row
  * hot path of every k-means round.
  *
  * Value-identical to the composed form (`graft.operators.KMeans
  * .assignComposed`): exact int64 distances, strict-< running minimum =
  * lowest centroid id wins ties (the composition's `array_position`
  * first-match) — asserted bitwise in KMeansSpec. A vector of the wrong
  * dimension — or one carrying a NULL element — yields NULL, mirroring
  * the composition (zip_with null-pads the former; a null element nulls
  * every composed distance, so `array_position` finds nothing). Reading
  * a null slot via getLong would silently treat it as 0 and assign the
  * row to a cluster computed from garbage.
  */
case class KMeansAssign(child: Expression, centroids: Array[Array[Long]])
    extends UnaryExpression {

  private val k = centroids.length
  private val dim = centroids.headOption.map(_.length).getOrElse(0)
  require(k > 0, "kmeans_assign needs at least one centroid")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects ARRAY<BIGINT>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "kmeans_assign"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  private def hasNullElement(v: ArrayData): Boolean = {
    var i = 0
    while (i < v.numElements()) {
      if (v.isNullAt(i)) return true
      i += 1
    }
    false
  }

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != dim || hasNullElement(v)) null
    else {
      var best = 0
      var bd = Long.MaxValue
      var c = 0
      while (c < k) {
        val ct = centroids(c)
        var dist = 0L
        var i = 0
        while (i < dim) {
          val t = v.getLong(i) - ct(i)
          dist += t * t
          i += 1
        }
        if (dist < bd) { bd = dist; best = c }
        c += 1
      }
      UnsafeArrayData.fromPrimitiveArray(Array(best.toLong, bd))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cRef = ctx.addReferenceObj("centroids", centroids, "long[][]")
      val best = ctx.freshName("best")
      val bd = ctx.freshName("bd")
      val c = ctx.freshName("c")
      val ct = ctx.freshName("ct")
      val dist = ctx.freshName("dist")
      val i = ctx.freshName("i")
      val t = ctx.freshName("t")
      val nn = ctx.freshName("nn")
      s"""
      |boolean $nn = ($v.numElements() != $dim);
      |if (!$nn) {
      |  for (int $i = 0; $i < $dim; $i++) {
      |    if ($v.isNullAt($i)) { $nn = true; break; }
      |  }
      |}
      |if ($nn) { ${ev.isNull} = true; } else {
      |  int $best = 0;
      |  long $bd = Long.MAX_VALUE;
      |  for (int $c = 0; $c < $k; $c++) {
      |    final long[] $ct = $cRef[$c];
      |    long $dist = 0L;
      |    for (int $i = 0; $i < $dim; $i++) {
      |      final long $t = $v.getLong($i) - $ct[$i];
      |      $dist += $t * $t;
      |    }
      |    if ($dist < $bd) { $bd = $dist; $best = $c; }
      |  }
      |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      |    .fromPrimitiveArray(new long[]{(long) $best, $bd});
      |}
      |""".stripMargin
    })
}
