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

/** One-pass term-frequency counter for a FIXED query term set: scans
  * the lowercased text once and returns ARRAY<LONG> of
  * [tf(term_0), …, tf(term_{K-1}), token_count] — the per-document
  * numbers BM25 needs. The column composition (K × size∘filter∘split +
  * one size∘split) allocates the token array per referencing expression
  * unless common-subexpression elimination happens to fire; this kernel
  * is one scan, zero allocations beyond the result, and its single
  * array output is consumed through a projection boundary (multi-use
  * non-cheap expressions block CollapseProject) so it runs once per row
  * by construction.
  *
  * Tokenization parity: split on every single 0x20 (empty tokens count,
  * matching `split(text, " ", -1)` / DuckDB `string_split(text, ' ')`),
  * term compare over lowercased UTF-8 bytes. */
object TermCounter {

  def counts(s: UTF8String, terms: Array[Array[Byte]]): ArrayData = {
    val bytes = s.toLowerCase.getBytes
    val k = terms.length
    val out = new Array[Long](k + 1)
    val n = bytes.length
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || bytes(i) == ' ') {
        out(k) += 1L
        val len = i - start
        var t = 0
        while (t < k) {
          val tb = terms(t)
          if (tb.length == len) {
            var j = 0
            while (j < len && bytes(start + j) == tb(j)) j += 1
            if (j == len) out(t) += 1L
          }
          t += 1
        }
        start = i + 1
      }
      i += 1
    }
    ArrayData.toArrayData(out)
  }

  /** Locale.ROOT pins locale-independent lowercasing: under a
    * Turkish/Azeri default JVM locale a term containing 'I' would
    * lowercase to dotless ı and silently never match the UTF8String
    * lowercasing used on the text side. */
  def termBytes(terms: Seq[String]): Array[Array[Byte]] =
    terms.map(_.toLowerCase(java.util.Locale.ROOT).getBytes("UTF-8")).toArray
}

/** One-pass token/bigram statistics for the quality-filter rules:
  * `[n_tok, n_uniq_tok, n_2gram, n_uniq_2gram]` in one scan of the UTF-8
  * bytes. The column composition (split + transform/concat +
  * 2×array_distinct) materializes the token array, allocates every
  * bigram string, and hashes them all per referencing expression; this
  * kernel walks the bytes once and interns ZERO-COPY slices.
  *
  * Parity is exact by construction:
  * - tokens are the single-0x20-separated segments, empty segments kept —
  *   `split(text, ' ', -1)` / DuckDB `string_split(text, ' ')` semantics
  *   (0x20 never occurs inside a multi-byte UTF-8 sequence, so the byte
  *   scan is codepoint-safe);
  * - adjacent tokens are separated by exactly one space, so
  *   `concat(tk[i-1], ' ', tk[i])` IS the original byte slice spanning
  *   both tokens — bigram distinctness = distinct byte slices, no
  *   concatenation ever happens;
  * - fewer than two tokens: the rules fall back to `[text]` as the
  *   bigram list (n_2gram = n_uniq_2gram = 1), mirroring the column form.
  */
object TokenStatsKernel {

  def stats(s: UTF8String): ArrayData = {
    val base = s.getBytes
    val n = base.length
    val uniqTok = new java.util.HashSet[UTF8String]()
    val uniqBi = new java.util.HashSet[UTF8String]()
    var nTok = 0L
    var start = 0
    var prevStart = -1
    var i = 0
    while (i <= n) {
      if (i == n || base(i) == 0x20) {
        nTok += 1L
        uniqTok.add(UTF8String.fromBytes(base, start, i - start))
        if (prevStart >= 0)
          uniqBi.add(UTF8String.fromBytes(base, prevStart, i - prevStart))
        prevStart = start
        start = i + 1
      }
      i += 1
    }
    ArrayData.toArrayData(Array(
      nTok,
      uniqTok.size.toLong,
      if (nTok < 2L) 1L else nTok - 1L,
      if (nTok < 2L) 1L else uniqBi.size.toLong))
  }
}

/** Catalyst wrapper over [[TokenStatsKernel.stats]]. */
case class TokenStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName expects STRING, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "token_stats"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override protected def nullSafeEval(input: Any): Any =
    TokenStatsKernel.stats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.TokenStatsKernel.stats($v);")
}

/** Catalyst wrapper over [[TermCounter.counts]]. */
case class TermCounts(child: Expression, terms: Seq[String]) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName expects STRING, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "term_counts"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  @transient private lazy val tb = TermCounter.termBytes(terms)

  override protected def nullSafeEval(input: Any): Any =
    TermCounter.counts(input.asInstanceOf[UTF8String], tb)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val ref = ctx.addReferenceObj("termBytes", tb, "byte[][]")
      s"${ev.value} = graft.functions.TermCounter.counts($v, $ref);"
    })
}

/** One-pass DISTINCT word-k-shingle extractor. A shingle over
  * single-space tokenization is exactly a byte-slice of the original
  * text (tokens split on ' ' and re-joined with ' ' reproduce the
  * source bytes), so this kernel records token start offsets in one
  * byte scan and emits zero-copy UTF8String slices deduped through a
  * hash set — no token array, no per-shingle string building, no
  * later array_distinct.
  *
  * Distinctness is semantics-preserving for every consumer: MinHash
  * minima are duplicate-insensitive and the Jaccard verify always
  * operated on distinct sets (reference: lsh.py's set-based shingling).
  * Parity with `NearDup.shinglesFromTokens`: same single-0x20 split
  * (empty tokens count), same whole-text fallback for docs shorter
  * than k tokens — ShingleKernelSpec pins set-equality and bitwise
  * minhash/Jaccard equality against the composed form. */
object ShingleKernel {

  def distinctShingles(s: UTF8String, k: Int): ArrayData = {
    val b = s.getBytes
    val n = b.length
    var nTok = 1
    var i = 0
    while (i < n) { if (b(i) == ' ') nTok += 1; i += 1 }
    if (nTok < k)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array[Any](s))
    // starts(j) = byte offset of token j; sentinel makes the end of
    // token j equal starts(j+1)-1 uniformly (incl. the last token)
    val starts = new Array[Int](nTok + 1)
    var t = 1
    i = 0
    while (i < n) { if (b(i) == ' ') { starts(t) = i + 1; t += 1 }; i += 1 }
    starts(nTok) = n + 1
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var j = 0
    while (j <= nTok - k) {
      val from = starts(j)
      seen.add(UTF8String.fromBytes(b, from, starts(j + k) - 1 - from))
      j += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Every word k-gram in order, duplicates kept; EMPTY when the text
    * has fewer than k tokens (unlike [[distinctShingles]]' whole-text
    * fallback — this matches the `range(1, len(tk)-1)` composition the
    * sketch/drift oracles use). Each shingle is a zero-copy slice. */
  def allShingles(s: UTF8String, k: Int): ArrayData = {
    val b = s.getBytes
    val n = b.length
    var nTok = 1
    var i = 0
    while (i < n) { if (b(i) == ' ') nTok += 1; i += 1 }
    if (nTok < k)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.empty[Any])
    val starts = new Array[Int](nTok + 1)
    var t = 1
    i = 0
    while (i < n) { if (b(i) == ' ') { starts(t) = i + 1; t += 1 }; i += 1 }
    starts(nTok) = n + 1
    val out = new Array[Any](nTok - k + 1)
    var j = 0
    while (j <= nTok - k) {
      val from = starts(j)
      out(j) = UTF8String.fromBytes(b, from, starts(j + k) - 1 - from)
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Catalyst wrapper over [[ShingleKernel.allShingles]] — every word
  * k-gram in order (duplicates kept, EMPTY under k tokens — the
  * `range(1, len(tk)-1)` oracle form), each a zero-copy byte slice of
  * the input (tokens are single-space separated, so a shingle IS the
  * substring spanning its k tokens). One pass, no token array, no
  * per-shingle concat. */
case class AllShingles(child: Expression, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName expects STRING, got $other")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "all_shingles"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override protected def nullSafeEval(input: Any): Any =
    ShingleKernel.allShingles(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.ShingleKernel.allShingles($v, $k);")
}

/** Catalyst wrapper over [[ShingleKernel.distinctShingles]]. */
case class DistinctShingles(child: Expression, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName expects STRING, got $other")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "distinct_shingles"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override protected def nullSafeEval(input: Any): Any =
    ShingleKernel.distinctShingles(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.ShingleKernel.distinctShingles($v, $k);")
}
