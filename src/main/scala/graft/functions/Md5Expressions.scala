package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, FloatType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Digest-to-integer md5 expressions for the hash-heavy pipeline paths
  * (embedder, MinHash, fingerprints). The composition form
  * `conv(substring(md5(x), 1, 8), 16, 10)` formats a 32-char hex string
  * and parses 8 chars of it back per call; these produce the SAME
  * values (md5 hex is big-endian bytes, so chunk c of the hex string ==
  * digest bytes 4c..4c+3 as an unsigned int) straight from the digest
  * bytes with no string round-trip. Equality is asserted in
  * Md5ExpressionsSpec.
  */
object Md5Expressions {
  /** bytes[off..off+3] of a digest as an unsigned 32-bit value. */
  @inline def chunk(digest: Array[Byte], off: Int): Long =
    ((digest(off) & 0xffL) << 24) |
      ((digest(off + 1) & 0xffL) << 16) |
      ((digest(off + 2) & 0xffL) << 8) |
      (digest(off + 3) & 0xffL)

  /** First 6 digest bytes big-endian == `('0x'||substr(md5_hex,1,12))
    * ::BIGINT` — the 48-bit hash domain KMV estimates over. */
  @inline def prefix48(digest: Array[Byte]): Long =
    ((digest(0) & 0xffL) << 40) |
      ((digest(1) & 0xffL) << 32) |
      ((digest(2) & 0xffL) << 24) |
      ((digest(3) & 0xffL) << 16) |
      ((digest(4) & 0xffL) << 8) |
      (digest(5) & 0xffL)

  def digestOf(bytes: Array[Byte]): Array[Byte] =
    java.security.MessageDigest.getInstance("MD5").digest(bytes)

  /** Lowercase-hex md5 of a UTF-8 string — THE shared derivation for
    * persistence-critical identities (catalog ingest-marker names,
    * streaming checkpoint source ids). One implementation on purpose:
    * these hex strings name durable files, and a copy that silently
    * diverged (charset, hex case) would re-key every marker — exactly
    * the re-ingest/skip failure the marker machinery exists to stop. */
  def hexDigestUtf8(s: String): String =
    digestOf(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString

  /** The whole md5 embedding from one digest: dim d is
    * `((h*(d+1)+d) % 10000) / 10000` with h = [[chunk]](digest, 0) —
    * exactly `Embedder.embedLocal` / the oracle's SQL fragment. Shared
    * by [[Md5Embed]]'s interpreted eval AND its generated code (one
    * static call keeps Janino happy and the two paths identical). */
  def embedArray(
      digest: Array[Byte], dim: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val h = chunk(digest, 0)
    val out = new Array[Float](dim)
    var d = 0
    while (d < dim) {
      out(d) = (((h * (d + 1) + d) % 10000L) / 10000.0).toFloat
      d += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  /** The replica-noise walk from one digest: ARRAY<LONG> where entry d
    * is `(h*(d+1)+d) % mod` with h = [[chunk]](digest, 0) — the same
    * per-dimension walk as [[embedArray]] but with the raw residues
    * exposed (the near-dup replica builder maps them to signed noise).
    * Values equal the composed `pmod(md5Int(x)*(d+1)+d, mod)` transform
    * and the oracle's SQL fragment; h < 2^32 and d < dim keep
    * `h*(d+1)+d` far from Long overflow for any realistic dim. Shared
    * by [[Md5NoiseWalk]]'s interpreted eval and generated code. */
  def noiseWalk(
      digest: Array[Byte], dim: Int, mod: Long): org.apache.spark.sql.catalyst.util.ArrayData = {
    val h = chunk(digest, 0)
    val out = new Array[Long](dim)
    var d = 0
    while (d < dim) {
      out(d) = (h * (d + 1) + d) % mod
      d += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  private[functions] def inputBytes(input: Any): Array[Byte] = input match {
    case s: UTF8String  => s.getBytes
    case b: Array[Byte] => b
  }

  /** One-pass MinHash: for shingle set S and hash h in [0,H), the min
    * over S of chunk h%4 of md5("(h/4)|" + s) — value-identical to the
    * composed per-group `transform` + `array_min` pipeline (and to the
    * oracle's substr/conv SQL), computed with one digest buffer and one
    * pass over S instead of materializing ceil(H/4) chunk arrays and
    * re-scanning them H times. Shared by [[MinhashSigs]]'s interpreted
    * and generated paths. */
  def minhashSigs(
      shingles: org.apache.spark.sql.catalyst.util.ArrayData,
      numHashes: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val groups = (numHashes + 3) / 4
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val md = java.security.MessageDigest.getInstance("MD5")
    val prefixes = Array.tabulate(groups)(g => (g.toString + "|").getBytes("UTF-8"))
    var i = 0
    val n = shingles.numElements()
    while (i < n) {
      val sBytes = shingles.getUTF8String(i).getBytes
      var g = 0
      while (g < groups) {
        md.reset()
        md.update(prefixes(g))
        md.update(sBytes)
        val d = md.digest()
        var c = 0
        while (c < 4) {
          val h = g * 4 + c
          if (h < numHashes) {
            val v = chunk(d, c * 4)
            if (v < mins(h)) mins(h) = v
          }
          c += 1
        }
        g += 1
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(mins)
  }

  /** One-pass SimHash from a token array: 64-bit md5 hash per token —
    * digest [[chunk]] 0 in the LOW 32 bits (so bits 0-31 vote exactly as
    * `Embedder.md5Int`, keeping bits<=32 fingerprints value-identical to
    * the historical form) and chunk 1 in the high 32 — then bit b of the
    * result is set iff the sign-vote over tokens is positive.
    * Value-identical to the composed transform + `bits` aggregate
    * passes; one digest buffer, one pass, `bits` counters. Shared by
    * [[SimhashFromTokens]]'s interpreted and generated paths. */
  def simhashFromTokens(
      tokens: org.apache.spark.sql.catalyst.util.ArrayData, bits: Int): Long = {
    require(bits >= 1 && bits <= 64, s"simhash bits must be in [1,64], got $bits")
    val votes = new Array[Long](bits)
    val md = java.security.MessageDigest.getInstance("MD5")
    var i = 0
    val n = tokens.numElements()
    while (i < n) {
      md.reset()
      val d = md.digest(tokens.getUTF8String(i).getBytes)
      val h = chunk(d, 0) | (chunk(d, 4) << 32)
      var b = 0
      while (b < bits) {
        votes(b) += (if (((h >> b) & 1L) == 1L) 1L else -1L)
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < bits) {
      if (votes(b) > 0L) out |= (1L << b)
      b += 1
    }
    out
  }
}

/** First 4 md5-digest bytes as an unsigned int (== the first 8 hex
  * chars parsed base-16). */
case class Md5PrefixInt(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName expects STRING or BINARY, got $other")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_prefix_int"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override protected def nullSafeEval(input: Any): Any = {
    val d = Md5Expressions.digestOf(Md5Expressions.inputBytes(input))
    Md5Expressions.chunk(d, 0)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val md = ctx.addMutableState(
        "java.security.MessageDigest", "md5PrefixDigest",
        n => s"""try { $n = java.security.MessageDigest.getInstance("MD5"); }
                |catch (java.security.NoSuchAlgorithmException e) { throw new RuntimeException(e); }
                |""".stripMargin)
      val d = ctx.freshName("d")
      val bytes =
        if (child.dataType == StringType) s"$v.getBytes()" else v
      // Call the static helper rather than emitting inline
      // cast-and-shift chains: Janino misparses
      // `((long)(b & 0xff)) << n` ("… is not a type") and Spark would
      // silently fall back to interpreted eval for the whole projection.
      s"""
      |byte[] $d = $md.digest($bytes);
      |${ev.value} = graft.functions.Md5Expressions.chunk($d, 0);
      |""".stripMargin
    })
}

/** First 6 md5-digest bytes as a 48-bit unsigned long (== the first 12
  * hex chars parsed base-16) — the fused twin of
  * `conv(substring(md5(x),1,12),16,10)`: one digest per row, no hex
  * string materialized, stays inside whole-stage codegen. */
case class Md5Prefix48(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName expects STRING or BINARY, got $other")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_prefix48"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override protected def nullSafeEval(input: Any): Any =
    Md5Expressions.prefix48(
      Md5Expressions.digestOf(Md5Expressions.inputBytes(input)))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val md = ctx.addMutableState(
        "java.security.MessageDigest", "md5Prefix48Digest",
        n => s"""try { $n = java.security.MessageDigest.getInstance("MD5"); }
                |catch (java.security.NoSuchAlgorithmException e) { throw new RuntimeException(e); }
                |""".stripMargin)
      val d = ctx.freshName("d")
      val bytes =
        if (child.dataType == StringType) s"$v.getBytes()" else v
      s"""
      |byte[] $d = $md.digest($bytes);
      |${ev.value} = graft.functions.Md5Expressions.prefix48($d);
      |""".stripMargin
    })
}

/** The fused md5 embedding: ARRAY<FLOAT> of `dim` dims from ONE digest
  * per row. The composition form (`transform` over a bound hash column)
  * is algebraically identical but operationally fragile: CollapseProject
  * inlines the bound hash into the lambda body — "referenced once" by
  * static count — and the transform then re-evaluates the full-text md5
  * once PER DIMENSION at runtime (measured: the entire ingest embed cost
  * was dim× what it should be). A single expression is immune to what
  * the optimizer does to projections around it. */
case class Md5Embed(child: Expression, dim: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName expects STRING or BINARY, got $other")
  }
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "md5_embed"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override protected def nullSafeEval(input: Any): Any =
    Md5Expressions.embedArray(
      Md5Expressions.digestOf(Md5Expressions.inputBytes(input)), dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val md = ctx.addMutableState(
        "java.security.MessageDigest", "md5EmbedDigest",
        n => s"""try { $n = java.security.MessageDigest.getInstance("MD5"); }
                |catch (java.security.NoSuchAlgorithmException e) { throw new RuntimeException(e); }
                |""".stripMargin)
      val bytes =
        if (child.dataType == StringType) s"$v.getBytes()" else v
      // Static helper call for the same Janino reason as Md5PrefixInt.
      s"""
      |${ev.value} = graft.functions.Md5Expressions.embedArray($md.digest($bytes), $dim);
      |""".stripMargin
    })
}

/** The replica-noise walk as a fused expression: ARRAY<LONG> of `dim`
  * residues `(h*(d+1)+d) % mod` from ONE md5 digest of the input (see
  * [[Md5Expressions.noiseWalk]]). Exists for the same reason as
  * [[Md5Embed]]: binding `md5Int(seed)` in a projection and referencing
  * it inside a `transform` lambda looks safe but CollapseProject
  * inlines the singly-referenced hash into the lambda body, and the
  * digest then re-evaluates once PER DIMENSION (round-14 advisor
  * finding on the q_embed_neardup_vec replica builder: ~64M extra
  * digests in the x100 cold build). A single expression evaluates the
  * digest exactly once per row no matter what the optimizer does to
  * the projections around it; the caller zips the walk with the vector
  * column instead of indexing a lambda. */
case class Md5NoiseWalk(child: Expression, dim: Int, mod: Long) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName expects STRING or BINARY, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "md5_noise_walk"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override protected def nullSafeEval(input: Any): Any =
    Md5Expressions.noiseWalk(
      Md5Expressions.digestOf(Md5Expressions.inputBytes(input)), dim, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val md = ctx.addMutableState(
        "java.security.MessageDigest", "md5NoiseWalkDigest",
        n => s"""try { $n = java.security.MessageDigest.getInstance("MD5"); }
                |catch (java.security.NoSuchAlgorithmException e) { throw new RuntimeException(e); }
                |""".stripMargin)
      val bytes =
        if (child.dataType == StringType) s"$v.getBytes()" else v
      // Static helper call for the same Janino reason as Md5PrefixInt.
      s"""
      |${ev.value} = graft.functions.Md5Expressions.noiseWalk($md.digest($bytes), $dim, ${mod}L);
      |""".stripMargin
    })
}

/** Fused one-pass MinHash signature over a shingle-array column:
  * ARRAY<LONG> of `numHashes` minima (see [[Md5Expressions.minhashSigs]]
  * for the exact hash family — identical to the composed form and the
  * DuckDB oracle). Returns null for a null input array; inputs are
  * non-empty by construction upstream (docShingles emits at least the
  * whole-text shingle). */
case class MinhashSigs(child: Expression, numHashes: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName expects ARRAY<STRING>, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sigs"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override protected def nullSafeEval(input: Any): Any =
    Md5Expressions.minhashSigs(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      // Static helper call for the same Janino reason as Md5PrefixInt.
      s"""
      |${ev.value} = graft.functions.Md5Expressions.minhashSigs($v, $numHashes);
      |""".stripMargin
    })
}

/** Fused one-pass SimHash over a token-array column: LONG fingerprint
  * of `bits` sign-vote bits (see [[Md5Expressions.simhashFromTokens]]).
  * The composed form (transform to a bound hash array + `bits`
  * aggregate lambdas) re-scans the hash array once per bit. */
case class SimhashFromTokens(child: Expression, bits: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName expects ARRAY<STRING>, got $other")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_from_tokens"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override protected def nullSafeEval(input: Any): Any =
    Md5Expressions.simhashFromTokens(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      // Static helper call for the same Janino reason as Md5PrefixInt.
      s"""
      |${ev.value} = graft.functions.Md5Expressions.simhashFromTokens($v, $bits);
      |""".stripMargin
    })
}

/** Fused token-bucket counts for the lexical embedder: ARRAY<DOUBLE> of
  * `dim` per-bucket token counts from one pass over the text (see
  * [[Embedder.lexicalBucketCounts]]). The composed form bound a token
  * bucket array and counted it per dimension — the same CollapseProject
  * lambda-inlining hazard as [[Md5Embed]], at dim× the tokenize+digest
  * cost when it fires. */
case class LexicalBuckets(child: Expression, dim: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName expects STRING, got $other")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "lexical_buckets"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override protected def nullSafeEval(input: Any): Any =
    Embedder.lexicalBucketCounts(input.asInstanceOf[UTF8String], dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      // Static helper call for the same Janino reason as Md5PrefixInt.
      s"""
      |${ev.value} = graft.functions.Embedder.lexicalBucketCounts($v, $dim);
      |""".stripMargin
    })
}

/** All four 32-bit chunks of an md5 digest as ARRAY<LONG> — one digest
  * call yields four independent hash values (the MinHash trick). */
case class Md5Chunks(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName expects STRING or BINARY, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "md5_chunks"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override protected def nullSafeEval(input: Any): Any = {
    val d = Md5Expressions.digestOf(Md5Expressions.inputBytes(input))
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      Array(
        Md5Expressions.chunk(d, 0), Md5Expressions.chunk(d, 4),
        Md5Expressions.chunk(d, 8), Md5Expressions.chunk(d, 12)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val md = ctx.addMutableState(
        "java.security.MessageDigest", "md5ChunksDigest",
        n => s"""try { $n = java.security.MessageDigest.getInstance("MD5"); }
                |catch (java.security.NoSuchAlgorithmException e) { throw new RuntimeException(e); }
                |""".stripMargin)
      val d = ctx.freshName("d")
      val arr = ctx.freshName("arr")
      val i = ctx.freshName("i")
      val bytes =
        if (child.dataType == StringType) s"$v.getBytes()" else v
      // Static helper call for the same Janino reason as Md5PrefixInt.
      s"""
      |byte[] $d = $md.digest($bytes);
      |long[] $arr = new long[4];
      |for (int $i = 0; $i < 4; $i++) {
      |  $arr[$i] = graft.functions.Md5Expressions.chunk($d, 4 * $i);
      |}
      |${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($arr);
      |""".stripMargin
    })
}
