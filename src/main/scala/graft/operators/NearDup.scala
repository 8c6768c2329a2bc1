package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** MinHash-banded near-duplicate detection — the LLM-training-pipeline
  * operator the reference lacks but its LSH machinery implies
  * (`lsh.py`'s band/bucket idea applied to set similarity).
  *
  * Pipeline: word shingles → H md5-derived minhashes → B band keys →
  * candidate pairs share at least one band bucket (groupBy/self-join on
  * the band key — NEVER all-pairs) → exact Jaccard verification of the
  * candidates only. With H=12, B=4 (3 rows/band) the LSH S-curve puts
  * the 50%-catch threshold near Jaccard ≈ (1/B)^(1/r) ≈ 0.63, so a 0.7
  * verify threshold loses little.
  *
  * All hash math is md5-prefix based, exactly reproducible in DuckDB —
  * q_neardup_pairs is hash-checked against an oracle that recomputes the
  * whole pipeline in SQL.
  *
  * At 100 TB: the only shuffle is on (band, bandKey) — 4 rows of ~25
  * bytes per document, not document text. Giant buckets (mass-duplicated
  * boilerplate) are the skew risk: cap candidates per bucket or salt the
  * verify join when a corpus is known to be boilerplate-heavy.
  */
object NearDup {

  case class Params(
      shingleSize: Int = 3,
      numHashes: Int = 12,
      bands: Int = 4,
      threshold: Double = 0.7,
      maxBucket: Int = 5000) {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    def rowsPerBand: Int = numHashes / bands
  }

  /** Enforce the giant-bucket cap: keep the `maxBucket` lowest ids per
    * bucket key, drop the rest. Mass-duplicated boilerplate otherwise
    * turns the bucket self-join into C(n,2) pairs per bucket — the one
    * skew that breaks banded LSH at 100 TB. The cap is deterministic
    * (id-ordered) so results are reproducible; members beyond the cap
    * lose near-dup recall ONLY against other members of the same
    * oversized bucket, which for boilerplate is the exact-dedup path's
    * job anyway. The window's hot-key task is linear in bucket size
    * (tiny rows), versus the quadratic join it prevents.
    *
    * The explicit fixed-N repartition (not a bare window) is
    * load-bearing: every capBuckets consumer self-joins the result on
    * the bucket key, and that join's OUTPUT is quadratic in bucket size
    * while its INPUT is a few bytes per row. AQE sizes post-shuffle
    * coalescing from the input bytes alone, so it would fold the
    * window's exchange down to 1-2 partitions (~64 MB advisory) and the
    * explosive join would inherit them — measured at x100: the
    * embedding-near-dup candidate join ran on 2 of 32 cores for 700+ s.
    * A user repartition with an explicit partition count is exempt from
    * AQE coalescing and satisfies the window's clustering requirement,
    * so the join keeps full parallelism at zero extra shuffles. */
  private[operators] def capBuckets(
      df: DataFrame,
      keys: Seq[String],
      idCol: String,
      maxBucket: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val n = df.sparkSession.sessionState.conf.numShufflePartitions
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(idCol))
    df.repartition(n, keys.map(col): _*)
      .withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= maxBucket)
      .drop("__rk")
  }

  /** Word k-shingles over an ALREADY-BOUND token-array column; documents
    * shorter than k tokens contribute their whole text as a single
    * shingle (so they can still exact-dup match). Callers must bind the
    * tokens in their own projection first (see [[docShingles]]):
    * referencing `split(text)` directly inside the lambda re-evaluates
    * the split for every shingle element (measured 10x slowdown). */
  def shinglesFromTokens(tk: Column, text: Column, k: Int): Column =
    when(size(tk) < k, array(text)).otherwise(
      transform(
        sequence(lit(0), size(tk) - k),
        i => concat_ws(" ", slice(tk, i + 1, lit(k)))))

  /** Convenience single-expression form (tests / ad-hoc use only). */
  def shingles(text: Column, k: Int): Column =
    shinglesFromTokens(split(text, " ", -1), text, k)

  /** Attach the MinHash signature column: for h in [0, H), min over
    * shingles of a 32-bit hash of the shingle. Hash h is chunk h%4 of
    * md5("(h/4)|shingle") — one md5 call yields FOUR independent 32-bit
    * hash functions (md5 output bits are independent), so a document of
    * S shingles costs ceil(H/4)*S md5 evaluations instead of H*S.
    * Computed by the fused one-pass [[graft.functions.MinhashSigs]]
    * kernel (one digest buffer, H running minima — no intermediate
    * chunk arrays, no H re-scans); [[withMinhashSignatureComposed]] is
    * the built-in-composition twin NearDupSpec pins it against. */
  def withMinhashSignature(
      df: DataFrame,
      shingleCol: String,
      outCol: String,
      numHashes: Int): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    df.withColumn(outCol,
      ColumnBridge.column(graft.functions.MinhashSigs(
        ColumnBridge.expression(col(shingleCol)), numHashes)))
  }

  /** The same signature from built-in compositions only (the shape the
    * DuckDB oracle mirrors in SQL) — kept as the equivalence twin for
    * the fused kernel. */
  def withMinhashSignatureComposed(
      df: DataFrame,
      shingleCol: String,
      outCol: String,
      numHashes: Int): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    val groups = (numHashes + 3) / 4
    val chunkCols = (0 until groups).map(g => s"__md5chunks_$g")
    // per shingle: one digest -> ARRAY<LONG> of its four 32-bit chunks
    // (no hex-string round trip; values equal the oracle's substr+conv)
    val withChunks = (0 until groups).foldLeft(df)((d, g) =>
      d.withColumn(chunkCols(g),
        transform(col(shingleCol), s =>
          ColumnBridge.column(graft.functions.Md5Chunks(
            ColumnBridge.expression(concat(lit(s"$g|"), s).cast("binary")))))))
    val sigEl = (0 until numHashes).map(h =>
      array_min(transform(col(chunkCols(h / 4)), a => element_at(a, h % 4 + 1))))
    withChunks.withColumn(outCol, array(sigEl: _*)).drop(chunkCols: _*)
  }

  /** Per-document DISTINCT shingle sets: (id, shingles), via the fused
    * one-pass [[graft.functions.DistinctShingles]] kernel (zero-copy
    * byte slices, set-deduped at the source). Distinctness changes no
    * consumer: minhash minima are duplicate-insensitive and the Jaccard
    * verify is defined over distinct sets. [[docShinglesComposed]] is
    * the built-in-composition twin ShingleKernelSpec pins this against. */
  def docShingles(df: DataFrame, idCol: String, textCol: String, p: Params): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    df.select(
      col(idCol),
      ColumnBridge.column(graft.functions.DistinctShingles(
        ColumnBridge.expression(col(textCol)), p.shingleSize)).as("shingles"))
  }

  /** The composed twin (split + transform + array_distinct) — the shape
    * the DuckDB oracle mirrors in SQL; kept for the equivalence spec.
    * The token array is bound in its own projection so the split
    * evaluates once per row. */
  def docShinglesComposed(df: DataFrame, idCol: String, textCol: String, p: Params): DataFrame =
    df.select(
        col(idCol),
        split(col(textCol), " ", -1).as("__tk"),
        col(textCol).as("__text"))
      .select(
        col(idCol),
        array_distinct(
          shinglesFromTokens(col("__tk"), col("__text"), p.shingleSize)).as("shingles"))

  /** Per-document band rows: (id, band, band_key) — the ONLY thing the
    * candidate self-join shuffles (ids + short keys, never text or
    * shingle arrays). */
  def bandRows(docsSh: DataFrame, idCol: String, p: Params): DataFrame = {
    val withSig = withMinhashSignature(docsSh, "shingles", "sig", p.numHashes)
    val keys = (0 until p.bands).map { b =>
      concat_ws(
        "_",
        (1 to p.rowsPerBand).map(r =>
          element_at(col("sig"), b * p.rowsPerBand + r).cast("string")): _*)
    }
    withSig.select(
      col(idCol),
      posexplode(array(keys: _*)).as(Seq("band", "band_key")))
  }

  /** The shared exact-Jaccard verify stage: join each side's distinct
    * shingle set back onto the candidate pairs (a LINEAR join chain —
    * pairs stream through once), compute J = |A∩B| / |A∪B|, keep pairs
    * at-or-above `threshold`. Both the self-join and the incremental
    * path end in exactly this block; one kernel keeps their Jaccard
    * definitions from drifting apart. Shingle arrays must already be
    * distinct at the source ([[docShingles]]), so no array_distinct
    * pass runs here. */
  private def verifyJaccardPairs(
      pairs: DataFrame,
      leftSh: DataFrame,
      rightSh: DataFrame,
      idCol: String,
      leftOut: String,
      rightOut: String,
      threshold: Double): DataFrame = {
    // SHUFFLE_HASH on the shingle-set side: the second attach's input
    // carries sh_a on every pair row, and a sort-merge join would sort
    // that fat stream (measured at x100 as the disk-exhausting spill in
    // the Jaccard family — see JaccardJoin.selfJoin). The hash build is
    // sets-bytes / shuffle-partitions, bounded at any corpus size.
    //
    // The sets are 64-bit shingle HASHES, sorted once per doc, and the
    // overlap is counted by the two-pointer SortedIntersectCount kernel
    // — not size(array_intersect(strings)) per pair, which hashed and
    // compared full shingle STRINGS per candidate and materialized the
    // intersection array just to size it (the JaccardShapeAB x100
    // decomposition measured the per-pair intersect at ~38% of the
    // sibling operator). Jaccard VALUES are unchanged short of a 64-bit
    // collision inside one compared pair (birthday in PER-PAIR set
    // sizes, ~1e-11; deterministic, so the oracle hash compare flags it
    // loudly) — the same documented trade JaccardJoin.selfJoin makes;
    // candidate generation was already hash-based.
    val hashedSets = (sh: DataFrame, outId: String, outCol: String) =>
      sh.select(col(idCol).as(outId),
        sort_array(transform(col("shingles"), g => xxhash64(g))).as(outCol))
    val verified = pairs
      .join(hashedSets(leftSh, leftOut, "sh_a").hint("SHUFFLE_HASH"), Seq(leftOut))
      .join(hashedSets(rightSh, rightOut, "sh_b").hint("SHUFFLE_HASH"), Seq(rightOut))
    val inter = {
      import org.apache.spark.sql.graft.ColumnBridge
      ColumnBridge.column(graft.functions.SortedIntersectCount(
        ColumnBridge.expression(col("sh_a")),
        ColumnBridge.expression(col("sh_b")))).cast("double")
    }
    val jac = inter / (size(col("sh_a")) + size(col("sh_b")) - inter).cast("double")
    verified
      .withColumn("jac", jac)
      .where(col("jac") >= threshold)
      .select(col(leftOut), col(rightOut), col("jac"))
  }

  /** Near-duplicate pairs (idA < idB) with their exact Jaccard, verified
    * over distinct shingle sets.
    *
    * FIRST-COLLISION enumeration via [[FirstCollision]], not
    * join-then-DISTINCT: a clone family collides in all `bands` bands,
    * so each family pair used to reach a pair-keyed HashAggregate once
    * per band — a pure bands-fold (4x) tax on the most expensive
    * exchange the operator has (measured as the #2 x100 gate query).
    * Each pair now emits only at its first agreeing band where both
    * docs survived the bucket cap; the dedup exchange is gone and the
    * pair set is identical by construction (cap-stress-spec'd in
    * NearDupSpec against the capped join+DISTINCT reference). */
  def nearDuplicatePairs(
      df: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      p: Params = Params()): DataFrame = {
    // docsSh is deliberately NOT cached: persisting the fat shingle
    // arrays pins hundreds of MB of driver-JVM blocks per call (measured
    // as GC bleed into subsequent queries), and recomputing the bounded
    // shingling per consumer is cheaper. The BAND rows however are tiny
    // (4 short key rows per doc) and feed a self-join — checkpointing
    // them halves the minhash work without the memory cost.
    val docsSh = docShingles(df, idCol, textCol, p)
    val bands = capBuckets(
      bandRows(docsSh, idCol, p), Seq("band", "band_key"), idCol, p.maxBucket)
      .localCheckpoint(true)
    val probe = FirstCollision.withSurvivalMap(
      bands, idCol, "band", "band_key", p.bands)
    val pairs = FirstCollision.pairs(
      probe, probe, idCol, "band", "band_key", p.bands, "id_a", "id_b", _ < _)
    verifyJaccardPairs(pairs, docsSh, docsSh, idCol, "id_a", "id_b", p.threshold)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"), col("jac"))
  }

  /** Incremental near-dup: candidates between an INCOMING batch and an
    * EXISTING corpus only — the shape a growing corpus actually needs.
    * A full self-join re-pays O(corpus) band work per ingest; here the
    * corpus side contributes band rows once (at 100 TB: the persisted
    * band table of the current corpus version, exactly like the
    * catalog's LSH signature table) and the batch side joins into it,
    * so cost per ingest is O(batch + matched buckets). Same-side pairs
    * are intentionally NOT emitted (in-batch dup handling is the batch's
    * own pre-dedup; corpus-internal pairs were found when those docs
    * were ingested). The existing side's buckets are capped as usual;
    * an incoming doc landing in a capped-out bucket still verifies
    * against the bucket's retained members.
    *
    * Returns (id_new, id_old, jac) for pairs at-or-above threshold. */
  def incrementalNearDupPairs(
      existing: DataFrame,
      incoming: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      p: Params = Params()): DataFrame = {
    val exSh = docShingles(existing, idCol, textCol, p)
    val inSh = docShingles(incoming, idCol, textCol, p)
    // NO checkpoints here (unlike the self-join path, which feeds ONE
    // probe frame into both join sides): each band table below is
    // consumed exactly once — withSurvivalMap is a single aggregation
    // whose exploded map entries ARE the probe rows — so the
    // shingle→minhash→cap lineage executes once per side as-is. The
    // eager double localCheckpoint this replaced doubled the query at
    // demo scale (sf0.1 1.09 → 2.00 s, the round-11 regression).
    val exBands = capBuckets(
      bandRows(exSh, idCol, p), Seq("band", "band_key"), idCol, p.maxBucket)
    // the INCOMING side is capped too: a boilerplate-heavy batch (a
    // re-crawl of one template) would otherwise put its whole bucket on
    // one join key — the exact skew the cap exists to stop
    val inBands = capBuckets(
      bandRows(inSh, idCol, p), Seq("band", "band_key"), idCol, p.maxBucket)
    // same first-collision enumeration as the self-join path (each
    // side's survival map reflects ITS OWN cap); the `keep` filter is
    // =!= — re-ingesting an unchanged doc puts the same id on both
    // sides, and the degenerate (id, id, 1.0) self-pair must never be
    // emitted (a pair-driven dedup dropping id_new would delete its
    // only copy)
    val pairs = FirstCollision.pairs(
      FirstCollision.withSurvivalMap(inBands, idCol, "band", "band_key", p.bands),
      FirstCollision.withSurvivalMap(exBands, idCol, "band", "band_key", p.bands),
      idCol, "band", "band_key", p.bands, "id_new", "id_old", _ =!= _)
    verifyJaccardPairs(pairs, inSh, exSh, idCol, "id_new", "id_old", p.threshold)
  }

  /** Reference LSH params for the semantic-dedup signature table:
    * 16-bit signatures. Measured tradeoff on the fixtures: 24 bits cuts
    * the ~70k bucket-collision candidates 256x but LOSES 15 of 51 true
    * near-dup pairs at sf0.01 — this embedder's near-identical vectors
    * sit at tiny sign margins, so every extra bit flips on real pairs.
    * Dedup is recall-first: keep 16 bits and pay the verify cost (the
    * candidate set stays bounded by the capped buckets either way). */
  val EmbedLshParams: LshIndex.Params =
    LshIndex.Params(hashSize = 16, numTables = 8, dim = 32, tag = "lshc")

  /** Reference LSH params for REAL (already ~zero-centered, unit-norm)
    * embedding columns like the fixtures' 64-dim `embeddings` table:
    * same 16-bit recall-first banding as [[EmbedLshParams]], dim 64,
    * its own plane family (tag), and NO centering shift (center = 0 —
    * shifting an already-centered space by 0.5 would recreate the
    * correlated-sign-bit degeneracy centering exists to fix). */
  val VecLshParams: LshIndex.Params =
    LshIndex.Params(hashSize = 16, numTables = 8, dim = 64, tag = "lshv")

  /** The PERSISTABLE half of semantic dedup: sign-LSH signatures over
    * ZERO-CENTERED embeddings. Centering matters: embeddings living in
    * the positive orthant (like the md5 embedder's [0,1) cube) give
    * correlated sign bits, every row lands in the same few buckets, and
    * the "bucketed" join silently degrades to all-pairs (measured: 87%
    * of all pairs became candidates). `center` is the per-component
    * shift — 0.5 for the [0,1) md5-embedder cube, 0 (no-op, no
    * transform in the plan) for an already-centered real embedding
    * space. At 100 TB write this table to parquet once per corpus
    * version (see q_embed_neardup) — candidate generation then never
    * touches embedding vectors. */
  def embeddingSignatures(
      df: DataFrame,
      idCol: String = "doc_id",
      embCol: String = "embedding",
      lshParams: LshIndex.Params = EmbedLshParams,
      center: Float = 0.5f): DataFrame =
    LshIndex.signatureTable(
      // centering is inlined into each of the numTables signature
      // expressions by CollapseProject — 8 small transforms per row,
      // negligible next to the 8x16 dot products they feed
      if (center == 0f) df.select(col(idCol), col(embCol))
      else df.select(
        col(idCol),
        transform(col(embCol), x => x - lit(center)).as(embCol)),
      lshParams, idCol, embCol)

  /** Candidate pairs + exact-cosine verify from an (optionally
    * persisted) [[embeddingSignatures]] table. The self-join shuffles
    * (id, table, 8-byte sig) only — embedding vectors are joined back
    * for the bounded candidate set alone — and buckets are capped like
    * the MinHash path (same mass-duplication skew risk).
    *
    * FIRST-COLLISION enumeration, not join-then-DISTINCT: a clone
    * family colliding in all L tables emits each pair L times, so the
    * DISTINCT's input is L x the true candidate set — at x100 (500k
    * docs, ~1000-member replica families) that was ~2 billion rows
    * into one hash aggregation, the stage that OOM'd the gate. Instead
    * each probe row carries its doc's per-table signature map, and the
    * join emits (a, b) only from the FIRST table where both survived
    * the cap and collided — every pair exactly once, same pair set as
    * the DISTINCT by construction, no dedup exchange at all. */
  def embeddingNearDupPairsFromSig(
      df: DataFrame,
      sig: DataFrame,
      idCol: String = "doc_id",
      embCol: String = "embedding",
      minCosine: Double = 0.999999,
      maxBucket: Int = 5000,
      numTables: Int = EmbedLshParams.numTables): DataFrame = {
    val capped = capBuckets(sig, Seq("table_idx", "sig"), idCol, maxBucket)
    // the shared exactly-once enumeration kernel: per-doc table -> sig
    // survival maps, statically-unrolled both-sides-null-guarded
    // earlier-collision predicate (the CodegenFallback and NULL-drop
    // lessons live in FirstCollision's doc). numTables is validated
    // against the data inside the kernel — a sig built with more
    // tables than claimed used to escape the unroll and silently
    // re-emit duplicates; now it fails loudly.
    val probe0 = FirstCollision.withSurvivalMap(
      capped, idCol, "table_idx", "sig", numTables)
    // VERIFY-INLINE: each doc's embedding rides its (numTables) probe
    // rows into the candidate join, so pairs emerge WITH both vectors
    // and the cosine verifies in the join's own projection. The old
    // shape attached vectors to the PAIR stream afterwards — two
    // SHUFFLE_HASH exchanges of candidate x 128-byte rows, which at
    // x100 is 62 M pairs ≈ 18 GB of exchange against a 500 k-doc
    // corpus. Carrying costs O(corpus x numTables) once (~1 GB) and
    // deletes both pair-stream joins; the pair set and every cosine
    // are bit-identical (same candidates, same float verify). The
    // attach is SHUFFLE_HASH (vector side is one row per doc).
    val probe = probe0.join(
      df.select(col(idCol), col(embCol).as("__v")).hint("SHUFFLE_HASH"),
      Seq(idCol))
    val pairs = FirstCollision.pairs(
      probe, probe, idCol, "table_idx", "sig", numTables, "id_a", "id_b", _ < _,
      carryA = Seq("__v" -> "__va"), carryB = Seq("__v" -> "__vb"))
    pairs
      .withColumn("cos", VectorFunctions.cosineSimilarity(col("__va"), col("__vb")))
      .where(col("cos") >= minCosine)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"), col("cos"))
  }

  /** Inline convenience form (no persisted tables): signatures are
    * checkpointed so the self-join doesn't recompute the
    * numTables*hashSize dot products per branch. The scale path
    * persists [[embeddingSignatures]] instead — see q_embed_neardup. */
  def embeddingNearDupPairs(
      df: DataFrame,
      idCol: String = "doc_id",
      embCol: String = "embedding",
      lshParams: LshIndex.Params = EmbedLshParams,
      minCosine: Double = 0.999999): DataFrame =
    embeddingNearDupPairsFromSig(
      df,
      embeddingSignatures(df, idCol, embCol, lshParams).localCheckpoint(true),
      idCol, embCol, minCosine, numTables = lshParams.numTables)
}
