package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, network-free text embedder.
  *
  * The reference embeds via the Cohere API (`app/core/embedding.py:19-82`)
  * but its own test suite substitutes a deterministic hash-based mock
  * (`tests/test_library_save_load.py:25-36`: `hash(text) % 10000 / 10000`
  * replicated across 32 dims). We adopt that pattern with two fixes that
  * matter for a distributed engine:
  *
  *  - Python's `hash()` is process-seeded (non-deterministic across runs);
  *    we use the first 8 hex chars of `md5(text)` instead, which is stable,
  *    available as a codegen'd Catalyst expression, AND expressible in
  *    DuckDB SQL (`('0x' || substr(md5(text),1,8))::BIGINT`) so embedder
  *    output is oracle-checkable bit-for-bit.
  *  - Replicating one value across all dims gives degenerate geometry
  *    (every pair either distance 0 or colinear); we vary each dim with
  *    `(h * (d+1) + d) % 10000 / 10000` so vectors spread over the cube
  *    while staying a pure function of the text.
  *
  * All three forms (Catalyst column, driver-local Scala, DuckDB SQL
  * fragment) implement the identical function. Catalyst↔local equality is
  * asserted bit-exactly by `EmbedderSpec`; the DuckDB form is proven by
  * the driver's hash compare on `q_embed_knn` (its oracle ranks by
  * distances over [[oracleEmbed]] while Spark ranks over [[embed]]).
  */
object Embedder {

  /** Embedding dimensionality (mirrors the reference mock's 32,
    * test_library_save_load.py:33-34). */
  val Dim = 32

  /** First 8 hex chars of md5(text) as an unsigned int in [0, 2^32) —
    * computed straight from the digest bytes ([[Md5PrefixInt]]; no
    * hex-string round trip), value-identical to the
    * `conv(substring(md5(x),1,8),16,10)` composition the oracles use. */
  def md5Int(text: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(Md5PrefixInt(ColumnBridge.expression(text.cast("binary"))))
  }

  /** Embedding from an ALREADY-BOUND md5-prefix hash column — the form
    * hot paths should use: referencing `md5Int(text)` inside the lambda
    * would re-evaluate the md5+conv for every dimension. */
  def embedFromHash(h: Column, dim: Int = Dim): Column =
    transform(
      sequence(lit(0), lit(dim - 1)),
      d =>
        (pmod(h * (d + lit(1)) + d, lit(10000)).cast("double") / lit(10000.0))
          .cast("float"))

  /** `ARRAY<FLOAT>` embedding of a text column. Pure built-ins — stays
    * inside whole-stage codegen, no UDF. Convenience single-expression
    * form; bulk paths go through [[withEmbedding]], which binds the
    * hash in its own projection first. */
  def embed(text: Column, dim: Int = Dim): Column =
    embedFromHash(md5Int(text), dim)

  /** Driver-local md5-prefix integer — the seed primitive shared by the
    * embedder and the LSH hyperplane generator. Equals [[md5Int]] (the
    * Catalyst form) and `('0x' || substr(md5(x),1,8))::BIGINT` (DuckDB). */
  def md5IntLocal(text: String): Long = {
    val hex = MessageDigest
      .getInstance("MD5")
      .digest(text.getBytes("UTF-8"))
      .map("%02x".format(_))
      .mkString
      .take(8)
    java.lang.Long.parseLong(hex, 16)
  }

  /** Driver-local twin of [[embed]] — used to embed query strings without
    * launching a job (the reference embeds the query text the same way it
    * embeds stored chunks, library_service.py:196-204). */
  def embedLocal(text: String, dim: Int = Dim): Array[Float] = {
    val h = md5IntLocal(text)
    Array.tabulate(dim)(d => (((h * (d + 1) + d) % 10000L) / 10000.0).toFloat)
  }

  /** DuckDB oracle fragment computing the identical embedding. */
  def oracleEmbed(textExpr: String, dim: Int = Dim): String =
    s"list_transform(range(0, $dim), d -> " +
      s"CAST(((('0x' || substr(md5($textExpr),1,8))::BIGINT * (d+1) + d) % 10000) / 10000.0 AS FLOAT))"

  /** Embed with dedup-before-embed: distinct texts are embedded once and
    * joined back, mirroring the reference's embedding cache
    * (`embedding.py:16,50-59` — a dict keyed by text). At scale this turns
    * an O(rows) embedding pass into O(distinct texts) plus one shuffle.
    *
    * The dedup key and the join key are `xxhash64(text)`, not the raw
    * text: shuffling full document bodies twice (distinct + join) is the
    * dominant cost at 100 TB, while a 64-bit key shuffles 8 bytes/row.
    * Collisions (p ≈ n²/2⁶⁵) would assign a colliding text the other
    * text's embedding — the standard content-hash identity assumption
    * every large-scale dedup pipeline already makes.
    */
  def withEmbedding(
      df: DataFrame,
      textCol: String = "text",
      outCol: String = "embedding",
      dim: Int = Dim): DataFrame = {
    val key = "__text_hash"
    val hashed = df.withColumn(key, xxhash64(col(textCol)))
    val embedded = hashed
      .select(col(key), col(textCol))
      .dropDuplicates(key)
      .select(col(key), md5Int(col(textCol)).as("__h")) // bind the md5 once
      .select(col(key), embedFromHash(col("__h"), dim).as(outCol))
    hashed.join(embedded, Seq(key)).drop(key)
  }
}
