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

  /** `ARRAY<FLOAT>` embedding of a text column: the fused [[Md5Embed]]
    * expression — ONE digest per row, codegen'd. The composition twin
    * ([[embedFromHash]] over a bound [[md5Int]]) computes identical
    * values (asserted bitwise in EmbedderSpec) but is dim× slower in
    * practice: CollapseProject inlines the bound hash into the
    * transform lambda, which re-evaluates the md5 per dimension. */
  def embed(text: Column, dim: Int = Dim): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(Md5Embed(ColumnBridge.expression(text.cast("binary")), dim))
  }

  /** ARRAY<LONG> noise walk `(md5Int(seed)*(d+1)+d) % mod` for d in
    * [0, dim) — the fused [[Md5NoiseWalk]] expression: ONE digest per
    * row, codegen'd. The composition twin (a bound [[md5Int]] referenced
    * from a `transform` lambda) computes identical values but
    * CollapseProject inlines the hash into the lambda and re-digests
    * per dimension (the exact [[embed]]/[[embedFromHash]] hazard).
    * `dim` must equal the vector column's length when the walk is
    * zip_with'd against it — zip_with pads the shorter side with nulls
    * rather than failing. */
  def noiseWalk(seed: Column, dim: Int, mod: Long): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(Md5NoiseWalk(ColumnBridge.expression(seed.cast("binary")), dim, mod))
  }

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
      dim: Int = Dim,
      model: Model = Md5Model): DataFrame = {
    // Dedup-before-embed pays for itself when the corpus is large (it
    // turns O(rows) embedding into O(distinct texts)); for a small input
    // — a delta append, a single-chunk update — its shuffle + join-back
    // cost more scheduling than the embedding they save. Logical stats
    // make the size test free: small inputs embed directly on the scan
    // side, zero extra exchanges.
    val small =
      df.queryExecution.optimizedPlan.stats.sizeInBytes <=
        BigInt(df.sparkSession.sessionState.conf.filesMaxPartitionBytes)
    if (small) model.embedDf(df, textCol, outCol, dim)
    else {
      val key = "__text_hash"
      val hashed = df.withColumn(key, xxhash64(col(textCol)))
      val embedded = model.embedDf(
        hashed.select(col(key), col(textCol)).dropDuplicates(key),
        textCol, outCol, dim)
        .select(col(key), col(outCol))
      hashed.join(embedded, Seq(key)).drop(key)
    }
  }

  /** A pluggable embedding model — the Spark mirror of the reference's
    * injectable embedding function (`embedding.py`'s client is swapped
    * for a deterministic mock in its own tests,
    * test_library_save_load.py:25-36). Both forms of a model MUST agree:
    * `embedCol` embeds stored chunks on executors, `embedLocal` embeds
    * query strings on the driver, and search compares their outputs. */
  sealed trait Model {
    def name: String
    /** Single-expression form (single-row updates, ad-hoc use). */
    def embedCol(text: Column, dim: Int): Column
    /** Bulk form: attach `outCol` to `df`. Both models route the
      * per-row heavy lifting through fused kernel expressions
      * ([[Md5Embed]], [[LexicalBuckets]]) — binding intermediates as
      * projection columns does NOT survive CollapseProject, which
      * inlines a once-referenced binding into lambda bodies and
      * multiplies the work per element. */
    def embedDf(df: DataFrame, textCol: String, outCol: String, dim: Int): DataFrame
    def embedLocal(text: String, dim: Int): Array[Float]
  }

  /** The default hash-point model (the object-level [[embed]] /
    * [[Embedder.embedLocal]] pair): a pure function of the whole text,
    * oracle-expressible, no semantic structure. */
  case object Md5Model extends Model {
    val name = "md5"
    def embedCol(text: Column, dim: Int): Column =
      Embedder.embed(text, dim) // fused Md5Embed: one digest per row
    def embedDf(df: DataFrame, textCol: String, outCol: String, dim: Int): DataFrame =
      df.withColumn(outCol, embedCol(col(textCol), dim))
    def embedLocal(text: String, dim: Int): Array[Float] =
      Embedder.embedLocal(text, dim)
  }

  /** Feature-hashed bag-of-words, L2-normalized: dimension d counts the
    * content tokens whose md5 bucket is d. Token overlap → cosine
    * similarity, which is what lets the reference's RELEVANCE golden
    * (the crypto-mining query of test_e2e.py:174-190, embedded there by
    * a real semantic model) hold under a deterministic, network-free
    * embedder: the golden chunk shares rare tokens with the query.
    * Tokenization in BOTH forms: lowercase alphanumeric runs, a compact
    * English stopword drop, and a 6-char prefix stem (so query "crypto"
    * matches corpus "cryptocurrencies" — the cheap deterministic stand-in
    * for real stemming). */
  case object LexicalModel extends Model {
    val name = "lexical"
    /** High-frequency function words carrying no relevance signal. */
    private[functions] val Stopwords: Seq[String] =
      ("a an and are as at be by do for from has have he how i in is it its " +
        "of on or that the this to was were what when where which will with you")
        .split(" ").toSeq
    private[functions] val StopwordSet: Set[String] = Stopwords.toSet
    private[functions] val StemLen = 6

    /** md5 bucket per content token — composed built-ins; kept as the
      * equivalence twin of the fused [[LexicalBuckets]] kernel (the
      * shape a SQL oracle would mirror). */
    private[graft] def bucketsCol(text: Column, dim: Int): Column = {
      import org.apache.spark.sql.graft.ColumnBridge
      val canon = regexp_replace(lower(text), "[^a-z0-9]+", " ")
      val stop = typedLit(Stopwords)
      val toks = filter(
        split(canon, " ", -1),
        t => length(t) > 0 && !array_contains(stop, t))
      transform(
        toks,
        t =>
          pmod(
            ColumnBridge.column(Md5PrefixInt(
              ColumnBridge.expression(substring(t, 1, StemLen).cast("binary")))),
            lit(dim)))
    }

    private[graft] def countsCol(buckets: Column, dim: Int): Column =
      transform(
        sequence(lit(0), lit(dim - 1)),
        d => size(filter(buckets, b => b === d)).cast("double"))

    /** Fused [[L2NormalizeCounts]] — ONE norm pass per row. The
      * composed twin below splices the bound norm aggregate into the
      * transform lambda, so the O(dim) norm re-evaluated per ELEMENT
      * (twice: the zero guard and the divide), interpreted — the same
      * hazard as q_hnsw_recall's normalizer, on the lexical ingest
      * path. Bitwise equality pinned in VectorDistanceSpec
      * ("L2NormalizeCounts == composed normalize bitwise"). */
    private[graft] def normalizeCol(counts: Column): Column = {
      import org.apache.spark.sql.graft.ColumnBridge
      ColumnBridge.column(L2NormalizeCounts(ColumnBridge.expression(counts)))
    }

    /** The composed-built-ins equivalence twin of [[normalizeCol]]
      * (what a SQL oracle mirrors) — spec/reference only; see the
      * per-element re-evaluation note above. */
    private[graft] def normalizeColComposed(counts: Column): Column = {
      val nrm = sqrt(aggregate(counts, lit(0.0), (a, x) => a + x * x))
      transform(counts,
        x => when(nrm === 0.0, lit(0.0f)).otherwise((x / nrm).cast("float")))
    }

    /** Fused bucket counts (one pass, one digest buffer) + composed
      * normalization. The counts column is referenced twice by
      * [[normalizeCol]] (norm + scale), so CollapseProject keeps the
      * binding; the per-token work lives in [[LexicalBuckets]], which no
      * projection rewrite can multiply. */
    private def countsKernel(text: Column, dim: Int): Column = {
      import org.apache.spark.sql.graft.ColumnBridge
      ColumnBridge.column(LexicalBuckets(ColumnBridge.expression(text), dim))
    }

    def embedCol(text: Column, dim: Int): Column =
      normalizeCol(countsKernel(text, dim))

    def embedDf(df: DataFrame, textCol: String, outCol: String, dim: Int): DataFrame =
      df.withColumn("__counts", countsKernel(col(textCol), dim))
        .withColumn(outCol, normalizeCol(col("__counts")))
        .drop("__counts")
    def embedLocal(text: String, dim: Int): Array[Float] = {
      val counts = new Array[Double](dim)
      text.toLowerCase
        .replaceAll("[^a-z0-9]+", " ")
        .split(" ")
        .filter(t => t.nonEmpty && !Stopwords.contains(t))
        .foreach(t => counts((md5IntLocal(t.take(StemLen)) % dim).toInt) += 1.0)
      val nrm = math.sqrt(counts.map(x => x * x).sum)
      if (nrm == 0.0) new Array[Float](dim)
      else counts.map(x => (x / nrm).toFloat)
    }
  }

  /** Registry: meta.json records the model by name; recovery resolves
    * it here (an unknown name fails loudly at load, not with silently
    * wrong distances). */
  val models: Map[String, Model] =
    Seq(Md5Model, LexicalModel).map(m => m.name -> m).toMap

  /** One-pass token-bucket counts for [[LexicalModel]]: canonicalize,
    * tokenize, stopword-drop, 6-char-prefix stem, md5 bucket, count —
    * per row, one digest buffer, no intermediate token/bucket arrays.
    * Value-identical to the composed `bucketsCol`/`countsCol` pipeline
    * (EmbedderSpec pins it); shared by [[LexicalBuckets]]'s interpreted
    * and generated paths. */
  def lexicalBucketCounts(
      text: org.apache.spark.unsafe.types.UTF8String,
      dim: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val counts = new Array[Double](dim)
    val canon = text.toLowerCase.toString.replaceAll("[^a-z0-9]+", " ")
    val md = MessageDigest.getInstance("MD5")
    canon.split(" ", -1).foreach { t =>
      if (t.nonEmpty && !LexicalModel.StopwordSet.contains(t)) {
        md.reset()
        val d = md.digest(t.take(LexicalModel.StemLen).getBytes("UTF-8"))
        val h = Md5Expressions.chunk(d, 0)
        counts((h % dim).toInt) += 1.0 // h is an unsigned 32-bit value
      }
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(counts)
  }
}
