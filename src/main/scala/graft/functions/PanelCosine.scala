package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Fused max-cosine against a small literal "panel" of vectors — the
  * codegen kernel behind semantic decontamination (q_semantic_decontam):
  * score every corpus row against all N eval vectors in ONE pass.
  *
  * The composed form (`greatest` over N [[VectorFunctions.cosineSimilarity]]
  * calls) re-evaluates the row's centering transform and norm once per
  * panel vector, allocates ~6 intermediate arrays per cosine, and — because
  * higher-order functions neither constant-fold nor codegen — recomputes
  * even the LITERAL panel norms per row in interpreted eval (measured 1.9 s
  * for a 5 000-row scan at sf0.1). Here the centered panel and its norms
  * are precomputed once as reference objects, the row's centered norm is
  * computed once, and the N dot products are straight-line generated Java:
  * no allocation, whole-stage codegen end to end.
  *
  * Arithmetic is BIT-IDENTICAL to the composed form (and to the DuckDB
  * oracle): center in FLOAT (`x - center`), widen each element to double,
  * accumulate in index order, divide by `sqrt(na) * sqrt(nb)` with the
  * same zero-magnitude guard (0.0, never NaN). Panel rows with zero norm
  * are rejected at construction so the guard is row-side only. Asserted
  * bitwise against the composition in PanelCosineSpec.
  *
  * Panels are literal by design: an eval benchmark is a few dozen rows,
  * not a corpus — inlining it keeps the corpus side a single scan with no
  * join (the same inline-the-small-side shape as the BM25 corpus stats).
  */
case class PanelMaxCosine(child: Expression, panel: Seq[Seq[Float]], center: Float)
    extends UnaryExpression {

  require(panel.nonEmpty, "panel must be non-empty")
  require(panel.map(_.length).distinct.size == 1,
    "panel vectors must share one dimensionality")

  private val dim: Int = panel.head.length

  /** Centered-then-widened panel matrix: the float subtraction happens
    * BEFORE the double cast, exactly like the row side and the oracle's
    * `CAST(x - CAST(0.5 AS FLOAT) AS DOUBLE)`. */
  private val centered: Array[Array[Double]] =
    panel.map(_.map(f => (f - center).toDouble).toArray).toArray

  /** sqrt of each panel vector's squared norm, index-order accumulation.
    * Strict: a degenerate panel fails at CONSTRUCTION, not mid-job. */
  private val normSqrts: Array[Double] = centered.map { row =>
    var s = 0.0
    var i = 0
    while (i < row.length) { s += row(i) * row(i); i += 1 }
    require(s > 0.0, "panel vector with zero centered norm")
    math.sqrt(s)
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects ARRAY<FLOAT>, got ${other.simpleString}")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "panel_max_cosine"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    if (a.numElements() != dim) return null
    var na = 0.0
    var i = 0
    while (i < dim) {
      val v = (a.getFloat(i) - center).toDouble
      na += v * v
      i += 1
    }
    if (na == 0.0) return 0.0
    val sna = math.sqrt(na)
    var best = Double.NegativeInfinity
    var p = 0
    while (p < centered.length) {
      val row = centered(p)
      var dot = 0.0
      i = 0
      while (i < dim) {
        dot += (a.getFloat(i) - center).toDouble * row(i)
        i += 1
      }
      val c = dot / (sna * normSqrts(p))
      if (c > best) best = c
      p += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val mat = ctx.addReferenceObj("panelMat", centered, "double[][]")
      val nrm = ctx.addReferenceObj("panelNorms", normSqrts, "double[]")
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      val v = ctx.freshName("v")
      val na = ctx.freshName("na")
      val sna = ctx.freshName("sna")
      val dot = ctx.freshName("dot")
      val row = ctx.freshName("row")
      val best = ctx.freshName("best")
      val c = ctx.freshName("c")
      s"""
      |if ($a.numElements() != $dim) { ${ev.isNull} = true; } else {
      |  double $na = 0.0;
      |  for (int $i = 0; $i < $dim; $i++) {
      |    final double $v = (double) ($a.getFloat($i) - ${center}f);
      |    $na += $v * $v;
      |  }
      |  if ($na == 0.0) { ${ev.value} = 0.0; } else {
      |    final double $sna = java.lang.Math.sqrt($na);
      |    double $best = java.lang.Double.NEGATIVE_INFINITY;
      |    for (int $p = 0; $p < ${centered.length}; $p++) {
      |      final double[] $row = $mat[$p];
      |      double $dot = 0.0;
      |      for (int $i = 0; $i < $dim; $i++) {
      |        $dot += (double) ($a.getFloat($i) - ${center}f) * $row[$i];
      |      }
      |      final double $c = $dot / ($sna * $nrm[$p]);
      |      if ($c > $best) $best = $c;
      |    }
      |    ${ev.value} = $best;
      |  }
      |}
      |""".stripMargin
    })
}
