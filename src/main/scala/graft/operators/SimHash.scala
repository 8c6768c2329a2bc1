package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Embedder

/** SimHash near-duplicate detection — the complementary dedup family to
  * [[NearDup]]'s MinHash: one b-bit fingerprint per document whose
  * Hamming distance tracks weighted token-multiset similarity.
  *
  * Candidate generation uses the pigeonhole chunk trick: split the
  * fingerprint into `chunks` pieces; two fingerprints within Hamming
  * distance (chunks - 1) MUST agree on at least one chunk, so a
  * self-join on (chunk_idx, chunk_value) finds every candidate without
  * all-pairs. Verification recomputes the exact Hamming distance on the
  * candidates only.
  *
  * At 100 TB: each document contributes `chunks` rows of (id, 8-byte
  * fingerprint, chunk) to the join — no text is shuffled. Two guards
  * keep the candidate set LINEAR in corpus size, because the bucket
  * space alone does not (any fixed bucket count eventually makes
  * candidates ~n²/buckets):
  *   - 64-bit fingerprints with 16-bit chunks give 4 × 65,536 bucket
  *     keys, so random (non-near-dup) chunk collisions stay rare far
  *     longer than the 8-bit-chunk layout they replaced (which packed
  *     the whole corpus into 1,024 buckets — measured quadratic at ×10
  *     corpus scale);
  *   - the same deterministic giant-bucket cap every other near-dup
  *     path uses ([[NearDup.capBuckets]]) bounds the residual skew from
  *     mass-duplicated boilerplate, which collides on ALL chunks by
  *     construction and no bucket-space widening can spread out.
  */
object SimHash {

  /** 64 bits / 16-bit chunks: pigeonhole sound for maxHamming <= 3, and
    * every engine stays exact — the fingerprint is a plain signed LONG
    * bit pattern on the JVM and a BIGINT in DuckDB (xor + bit_count are
    * two's-complement-safe in both). maxBucket mirrors
    * [[NearDup.Params.maxBucket]]. */
  case class Params(
      bits: Int = 64,
      chunks: Int = 4,
      maxHamming: Int = 3,
      maxBucket: Int = 5000) {
    require(bits >= 1 && bits <= 64, "bits must fit in one long")
    require(bits % chunks == 0, "bits must divide into chunks")
    require(maxHamming < chunks,
      "pigeonhole soundness needs maxHamming < chunks")
    def chunkBits: Int = bits / chunks
  }

  /** SimHash of a BOUND token-hash array column: bit b is set iff the
    * sum over tokens of (+1 if bit b of the token hash is set, else -1)
    * is positive. Token hashes carry up to 64 usable bits (see
    * [[tokenHash64]]); `lit(1L << b)` is the signed bit value, so bit 63
    * contributes Long.MinValue — the sum of distinct bit values is the
    * fingerprint's exact two's-complement long. */
  def simhash(tokenHashes: Column, bits: Int): Column =
    (0 until bits)
      .map { b =>
        val vote = aggregate(
          tokenHashes,
          lit(0L),
          (acc, h) =>
            acc + when(shiftright(h, b).bitwiseAND(lit(1L)) === 1L, lit(1L))
              .otherwise(lit(-1L)))
        when(vote > 0L, lit(1L << b)).otherwise(lit(0L))
      }
      .reduce(_ + _)

  /** 64-bit per-token hash: md5 digest chunk 0 in the LOW 32 bits
    * (identical to [[Embedder.md5Int]] there, so bits<=32 fingerprints
    * match the historical layout) and chunk 1 in the high 32. DuckDB
    * twin: `hv0 | (hv1 << 32)` assembled overflow-free from the first
    * two 8-hex-char md5 prefixes (see the q_simhash_pairs oracle). */
  def tokenHash64(token: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    val chunks = ColumnBridge.column(
      graft.functions.Md5Chunks(ColumnBridge.expression(token.cast("binary"))))
    element_at(chunks, 1).bitwiseOR(shiftleft(element_at(chunks, 2), 32))
  }

  /** (id, simhash) for every document — the fused one-pass
    * [[graft.functions.SimhashFromTokens]] kernel (the composed
    * [[fingerprintsComposed]] form re-scans the token-hash array once
    * per bit; SimHashSpec pins their equality). */
  def fingerprints(
      df: DataFrame,
      idCol: String,
      textCol: String,
      p: Params = Params()): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    df.select(
      col(idCol),
      ColumnBridge.column(graft.functions.SimhashFromTokens(
        ColumnBridge.expression(split(col(textCol), " ", -1)), p.bits))
        .as("simhash"))
  }

  /** Built-in-composition twin of [[fingerprints]] (the shape the DuckDB
    * oracle mirrors in SQL). */
  def fingerprintsComposed(
      df: DataFrame,
      idCol: String,
      textCol: String,
      p: Params = Params()): DataFrame =
    df.select(
        col(idCol),
        transform(split(col(textCol), " ", -1), t => tokenHash64(t)).as("__hv"))
      .select(col(idCol), simhash(col("__hv"), p.bits).as("simhash"))

  /** Near-duplicate pairs (idA < idB) with exact Hamming distance <=
    * maxHamming. Buckets are capped ([[NearDup.capBuckets]]) before the
    * self-join: members beyond the cap lose recall only against other
    * members of the same oversized bucket — for the boilerplate that
    * creates such buckets, the exact-dedup path's job anyway.
    *
    * FIRST-COLLISION enumeration, not join-then-DISTINCT (the same
    * rewrite as [[NearDup.embeddingNearDupPairsFromSig]]): clone
    * families share whole fingerprints, so they collide on ALL chunks
    * and the old DISTINCT ingested every candidate `chunks` times. A
    * pair is emitted only from its lowest agreeing chunk where both
    * docs survived the cap — since every row carries the full 64-bit
    * fingerprint, "agrees at an earlier chunk" is three bit ops on the
    * already-joined columns, and the only extra state is a per-doc
    * `chunks`-bit cap-survival mask. No dedup exchange remains. */
  def nearDuplicatePairs(
      df: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      p: Params = Params()): DataFrame = {
    val fp = fingerprints(df, idCol, textCol, p)
    val chunkVals = (0 until p.chunks).map(c =>
      shiftright(col("simhash"), c * p.chunkBits)
        .bitwiseAND(lit((1L << p.chunkBits) - 1)))
    // tiny (id, fingerprint, chunk) rows; checkpointing keeps the
    // self-join from computing the 64 sign-vote aggregates twice
    val chunked = NearDup.capBuckets(
        fp.select(
          col(idCol), col("simhash"),
          posexplode(array(chunkVals: _*)).as(Seq("chunk_idx", "chunk_val"))),
        Seq("chunk_idx", "chunk_val"), idCol, p.maxBucket)
      .localCheckpoint(true)
    // cap-survival mask: bit c set iff this doc's row survived the cap
    // in its chunk-c bucket (a doc can be capped out of one chunk's
    // giant bucket yet survive another's)
    val masks = chunked.groupBy(col(idCol))
      .agg(sum(expr("shiftleft(1L, chunk_idx)")).as("__mask"))
    val probe = chunked.join(masks, Seq(idCol))
    val a = probe.select(
      col(idCol).as("id_a"), col("simhash").as("sh_a"),
      col("__mask").as("__mask_a"), col("chunk_idx"), col("chunk_val"))
    val b = probe.select(
      col(idCol).as("id_b"), col("simhash").as("sh_b"),
      col("__mask").as("__mask_b"), col("chunk_idx"), col("chunk_val"))
    val x = col("sh_a").bitwiseXOR(col("sh_b"))
    // emitted before: some chunk c < chunk_idx where both survived the
    // cap and the fingerprints agree on chunk c — the shared
    // [[FirstCollision]] predicate shape, with the bitmask/xor state
    // encoding instead of the survival map (every row already carries
    // the full 64-bit fingerprint, so agreement is three bit ops and
    // the only extra state is a `chunks`-bit mask)
    val earlierCollision = FirstCollision.earlierCollision(
      col("chunk_idx"),
      p.chunks,
      c => shiftright(col("__mask_a"), c).bitwiseAND(lit(1L)) === 1L,
      c => shiftright(col("__mask_b"), c).bitwiseAND(lit(1L)) === 1L,
      c => shiftright(x, c * p.chunkBits)
        .bitwiseAND(lit((1L << p.chunkBits) - 1)) === 0L)
    val hamming = bit_count(x)
    a.join(b, Seq("chunk_idx", "chunk_val"))
      .where(col("id_a") < col("id_b") && !earlierCollision)
      .where(hamming <= p.maxHamming)
      .select(
        col("id_a").as("doc_a"),
        col("id_b").as("doc_b"),
        hamming.cast("long").as("hamming"))
  }
}
