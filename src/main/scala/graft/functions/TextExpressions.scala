package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused fingerprinting kernels. The column compositions in
  * [[TextAnalysis]] (charCodes → gramHashesFromCodes → winnow) are
  * correct and oracle-documented, but each stage materializes an
  * intermediate array per row and the per-char `substr` path allocates a
  * UTF8String per character — measured ~3.8 s for the sf0.1 corpus.
  * These expressions compute identical values in one pass per row
  * (codepoints → polynomial grams → window minima), with codegen
  * emitting calls to the static [[TextFingerprint]] helpers (inline
  * cast-and-shift chains trip Janino — see Md5Expressions).
  *
  * Value parity with the column forms and the DuckDB oracle is exact for
  * BMP text (the fixtures are ASCII); TextExpressionsSpec asserts
  * bit-equality against the column composition on the real corpus.
  */
object TextFingerprint {

  /** Same polynomial as TextAnalysis.{GramB, GramM}. */
  val B: Long = TextAnalysis.GramB
  val M: Long = TextAnalysis.GramM

  def gramHashes(s: UTF8String, k: Int): ArrayData = {
    val cps = s.toString.codePoints().toArray
    val n = cps.length
    if (n < k) {
      var h = 0L
      var i = 0
      while (i < n) { h = (h * B + cps(i)) % M; i += 1 }
      return ArrayData.toArrayData(Array(h))
    }
    val pows = new Array[Long](k)
    pows(0) = 1L
    var j = 1
    while (j < k) { pows(j) = pows(j - 1) * B % M; j += 1 }
    val out = new Array[Long](n - k + 1)
    var i = 0
    while (i <= n - k) {
      // direct O(k) sum — terms < 2^32, k-term sums < 2^35: no overflow,
      // and bit-identical to the column/oracle form (single mod at the end)
      var h = 0L
      var g = 0
      while (g < k) { h += cps(i + g) * pows(k - 1 - g); g += 1 }
      out(i) = h % M
      i += 1
    }
    ArrayData.toArrayData(out)
  }

  def winnow(grams: ArrayData, w: Int): ArrayData = {
    val n = grams.numElements()
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    if (n < w) {
      var i = 0
      while (i < n) { seen.add(grams.getLong(i)); i += 1 }
    } else {
      var j = 0
      while (j <= n - w) {
        var min = grams.getLong(j)
        var i = j + 1
        while (i < j + w) {
          val v = grams.getLong(i)
          if (v < min) min = v
          i += 1
        }
        seen.add(min)
        j += 1
      }
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    ArrayData.toArrayData(out)
  }
}

/** Polynomial k-gram hashes of a string in one pass — value-identical to
  * `TextAnalysis.gramHashesFromCodes(charCodes(text), k)`. */
case class GramHashes(child: Expression, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName expects STRING, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "gram_hashes"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override protected def nullSafeEval(input: Any): Any =
    TextFingerprint.gramHashes(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.TextFingerprint.gramHashes($v, $k);")
}

/** Winnowing fingerprint (distinct w-window minima, first-occurrence
  * order) of a gram-hash array — value-identical to
  * `TextAnalysis.winnow(grams, w)`. */
case class Winnow(child: Expression, w: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName expects ARRAY<LONG>, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override protected def nullSafeEval(input: Any): Any =
    TextFingerprint.winnow(input.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.TextFingerprint.winnow($v, $w);")
}
