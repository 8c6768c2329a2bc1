package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Embedder

/** SimHash near-duplicate detection — the complementary dedup family to
  * [[NearDup]]'s MinHash: one b-bit fingerprint per document whose
  * Hamming distance tracks weighted token-multiset similarity.
  *
  * Candidate generation uses the pigeonhole chunk trick: split the
  * fingerprint into `chunks` byte-sized pieces; two fingerprints within
  * Hamming distance (chunks - 1) MUST agree on at least one chunk, so a
  * self-join on (chunk_idx, chunk_value) finds every candidate without
  * all-pairs. Verification recomputes the exact Hamming distance on the
  * candidates only.
  *
  * At 100 TB: each document contributes `chunks` rows of (id, 8-byte
  * fingerprint, chunk) to the join — no text is shuffled; chunk-value
  * buckets are bounded by 2^8 distinct values per index, so skew is
  * capped by true fingerprint collisions (mass-duplicated boilerplate),
  * same caveat as MinHash banding.
  */
object SimHash {

  /** bits=32 keeps every engine (Spark, DuckDB, JVM longs) exact;
    * maxHamming=1 on 32 bits means "near-identical token profile". */
  case class Params(bits: Int = 32, chunks: Int = 4, maxHamming: Int = 1) {
    require(bits % chunks == 0, "bits must divide into chunks")
    require(maxHamming < chunks,
      "pigeonhole soundness needs maxHamming < chunks")
    def chunkBits: Int = bits / chunks
  }

  /** SimHash of a BOUND token-hash array column: bit b is set iff the
    * sum over tokens of (+1 if bit b of the token hash is set, else -1)
    * is positive. */
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
        transform(split(col(textCol), " ", -1), t => Embedder.md5Int(t)).as("__hv"))
      .select(col(idCol), simhash(col("__hv"), p.bits).as("simhash"))

  /** Near-duplicate pairs (idA < idB) with exact Hamming distance <=
    * maxHamming. */
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
    // self-join from computing the 32 sign-vote aggregates twice
    val chunked = fp.select(
        col(idCol), col("simhash"),
        posexplode(array(chunkVals: _*)).as(Seq("chunk_idx", "chunk_val")))
      .localCheckpoint(true)
    val a = chunked.select(
      col(idCol).as("id_a"), col("simhash").as("sh_a"),
      col("chunk_idx"), col("chunk_val"))
    val b = chunked.select(
      col(idCol).as("id_b"), col("simhash").as("sh_b"),
      col("chunk_idx"), col("chunk_val"))
    val hamming = bit_count(col("sh_a").bitwiseXOR(col("sh_b")))
    a.join(b, Seq("chunk_idx", "chunk_val"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sh_a"), col("sh_b"))
      .distinct()
      .where(hamming <= p.maxHamming)
      .select(
        col("id_a").as("doc_a"),
        col("id_b").as("doc_b"),
        hamming.cast("long").as("hamming"))
  }
}
