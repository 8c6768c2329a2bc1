package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** EXACT n-gram Jaccard similarity self-join via prefix filtering — the
  * AllPairs/PPJoin family shape (Bayardo et al., WWW'07; Xiao et al.,
  * WWW'08): complete for `J >= tNum/tDen` with NO all-pairs stage and no
  * probabilistic misses (the MinHash path in [[NearDup]] trades recall
  * for candidate volume; this operator trades a frequency pass for
  * exactness).
  *
  * Why it scales: every pair with Jaccard >= t shares at least one
  * shingle among the first `|d| - ceil(t*|d|) + 1` of EACH side's
  * shingles under one fixed global order (rarest-first pigeonhole:
  * J >= t forces an overlap of >= ceil(t*|d|), which cannot fit in the
  * ceil(t*|d|) - 1 suffix slots). So candidates come from equi-joining
  * only those prefixes, and ordering by ascending global frequency makes
  * the joined prefix shingles the RAREST ones — the fan-out per join key
  * is smallest where a hot shingle would otherwise explode. Shuffles:
  * one groupBy(shingle) for frequencies, one doc-keyed window for
  * prefixes, the candidate equi-join, and the verify joins — all keyed,
  * never cartesian (reference semantics: near-dup detection family,
  * services/chunk_service.py-adjacent dedup tooling has no analog; this
  * is beyond-parity surface for the training-data pipeline).
  *
  * Thresholds are RATIONAL (`tNum/tDen`) and every comparison is integer
  * cross-multiplication (`tDen*inter >= tNum*union`), so the exact same
  * pair set falls out of any engine evaluating the same definition —
  * float thresholds would make the boundary pair engine-dependent.
  */
object JaccardJoin {

  /** Per-document prefix-length bound, ENFORCED (not advised): each of a
    * doc's P prefix rows carries its `pe` array of rn-1 hashes, so the
    * per-doc candidate-exchange payload is Sum(rn-1) ≈ 8·P²/2 bytes —
    * quadratic in the prefix, hence in document length. At the default
    * cap (4096) one doc tops out at ~67 MB of pe payload (one task's
    * worth); an UNSEGMENTED 100k-shingle crawl document (P ≈ 40k at
    * t = 0.6) would ship ~6.4 GB through the exchange and take the
    * stage down — a latent hazard a comment cannot guard. Above-knee
    * docs fail the query LOUDLY (assert_true per prefix row, one int
    * comparison — the RangeJoin bucket-storm discipline): exactness is
    * this operator's contract, and silently auto-segmenting a document
    * would redefine its pair set. Segment long documents upstream
    * (the chunking operator, q_chunk_docs) or raise the cap
    * deliberately. tools/JaccardPayloadCurve measures the growth. */
  val DefaultMaxPrefixLen: Int = 4096

  /** Task fan-out for the three heavy stages (candidate join, the two
    * verify attaches): each runs at `TaskFanout ×` the session shuffle
    * partitions. DEFAULT 1 — the 4× fan-out tried for the round-15
    * straggler lottery was REFUTED by a same-session A/B
    * (tools/JaccardStageProbe with the cpu/fetch/gc split, ×100,
    * SCALING.md round 16): at 4× every measured pass ran 107–454 s wall
    * where every 1× pass ran 51–92 s, and the heavy stages' summed
    * task-CPU inflated 1.5–10× with ZERO fetch-wait and minor GC — the
    * extra partitions multiply per-task memory/page churn on the
    * array-payload build sides, and the longer sustained load makes the
    * whole box slower (same-config passes vary 2.5× in thread-CPU on
    * identical work; the VM's accounting absorbs weather). The
    * hot-bucket hypothesis was separately refuted by
    * tools/JaccardBucketCensus (103 701 buckets, max m = 800 = 0.02 %
    * of Σm² candidate work), and at 1× the stage probe shows the heavy
    * stages near-uniform (max/mean ≤ 2.2 over 32 tasks) — which is
    * exactly the shape cluster-side SPECULATIVE EXECUTION needs to
    * absorb a degraded host at 1000 executors; finer tasks are not.
    * Overridable via -DGRAFT_JACCARD_FANOUT / env so the probes can A/B
    * without recompiling. */
  def TaskFanout: Int =
    sys.props.get("GRAFT_JACCARD_FANOUT")
      .orElse(sys.env.get("GRAFT_JACCARD_FANOUT"))
      .flatMap(_.toIntOption).getOrElse(1)

  /** All pairs (doc_a < doc_b) with n-gram Jaccard >= tNum/tDen.
    * Output: doc_a, doc_b, n_common, n_union (exact integer set sizes).
    * `k` is the word-shingle width; shorter docs contribute their whole
    * text as one shingle ([[NearDup.shinglesFromTokens]] convention).
    *
    * COLLISION BOUND (the one caveat on "exact"): shingles are replaced
    * by xxhash64 values before the set arithmetic, so two DISTINCT
    * shingles colliding at 64 bits inside one compared pair can shift
    * n_common/n_union. The probability is birthday-scale in the PER-PAIR
    * set sizes (~1e-11 for 1e5-shingle documents), not in the corpus
    * vocabulary — candidate COMPLETENESS is collision-proof, because
    * prefix filtering only needs SOME consistent global shingle order
    * and hash-merged frequencies still give one. Callers who need
    * unconditional exactness set `verifyWithStrings = true`: the verify
    * stage then intersects the raw shingle-string sets (the candidate
    * stages keep moving longs), trading verify-stage bytes for a
    * zero-collision guarantee. */
  def selfJoin(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 3,
      tNum: Int = 3,
      tDen: Int = 5,
      verifyWithStrings: Boolean = false,
      maxPrefixLen: Int = DefaultMaxPrefixLen): DataFrame = {
    require(tNum > 0 && tDen > 0 && tNum <= tDen,
      s"threshold must be a rational in (0,1]: $tNum/$tDen")
    val (raw, sets) = shingleSets(df, idCol, textCol, k)
    val candidates = candidatePairsOf(sets, tNum, tDen, maxPrefixLen)
    // verify sets: hashed longs by default; the raw shingle strings when
    // the caller opted into unconditional exactness (see scaladoc)
    val verifySets =
      if (verifyWithStrings) raw.select(col("doc_id"), col("shingles").as("s"))
      else sets
    // SHUFFLE_HASH on the sets side: after the first attach every pair
    // row carries a whole shingle array, and a sort-merge plan SORTS
    // that fat stream for the second attach — at x100 the sorter's
    // spill (fat rows written once into the exchange and again by the
    // sort) exhausted the gate's disk. Building a per-partition hash
    // map of the O(corpus) sets side instead lets the fat stream flow
    // through unsorted; at scale the build stays bounded because it is
    // sets-bytes / shuffle-partitions.
    //
    // The hashed-set verify counts the overlap with the two-pointer
    // [[graft.functions.SortedIntersectCount]] kernel over the sorted
    // sets (sorted once per DOC in shingleSets) instead of
    // size(array_intersect(..)) per PAIR — the built-in buildss a hash
    // set and materializes the intersection array per candidate, and
    // the x100 decomposition (tools/JaccardShapeAB) measured that term
    // at ~48 s of the 127 s query. Counts are identical by definition;
    // the string path (opt-in unconditional exactness) keeps the
    // built-in (strings have no cheap total order worth sorting by).
    val inter =
      if (verifyWithStrings) size(array_intersect(col("sa"), col("sb")))
      else {
        import org.apache.spark.sql.graft.ColumnBridge
        ColumnBridge.column(graft.functions.SortedIntersectCount(
          ColumnBridge.expression(col("sa")),
          ColumnBridge.expression(col("sb"))))
      }
    // the repartitions ARE the exchanges the two joins would insert
    // anyway (hash on the join key satisfies the required distribution;
    // EnsureRequirements co-partitions the build side to match) at
    // TaskFanout × the session partitions (default 1× — see TaskFanout's
    // scaladoc for why wider was measured strictly worse).
    val n = df.sparkSession.sessionState.conf.numShufflePartitions
    candidates
      .repartition(n * TaskFanout, col("doc_a"))
      .join(
        verifySets.select(col("doc_id").as("doc_a"), col("s").as("sa"))
          .hint("SHUFFLE_HASH"), "doc_a")
      .repartition(n * TaskFanout, col("doc_b"))
      .join(
        verifySets.select(col("doc_id").as("doc_b"), col("s").as("sb"))
          .hint("SHUFFLE_HASH"), "doc_b")
      .select(
        col("doc_a"), col("doc_b"),
        inter.as("n_common"),
        (size(col("sa")) + size(col("sb")) - inter).as("n_union"))
      .where(lit(tDen) * col("n_common") >= lit(tNum) * col("n_union"))
  }

  /** The candidate stage of [[selfJoin]], factored so the scale probes
    * (tools/JaccardShapeAB) can time enumeration / verify-attach /
    * intersection in isolation on the EXACT shipped plan shapes.
    * Input: the hashed shingle-set table from [[shingleSets]]; output:
    * the (doc_a, doc_b) candidate pairs, each emitted exactly once. */
  private[graft] def candidatePairsOf(
      sets: DataFrame,
      tNum: Int,
      tDen: Int,
      maxPrefixLen: Int): DataFrame = {
    // explicit fixed-N repartition on the join key: the prefix rows are
    // a few bytes each, so AQE's input-byte coalescing would fold the
    // candidate join down to 1-2 partitions while the join's OUTPUT is
    // quadratic per hot shingle (the capBuckets lesson in NearDup.scala
    // — measured there as a 2-of-32-core stage at x100). A user
    // repartition with an explicit count is exempt from coalescing and
    // satisfies the equi-join's required distribution, so this costs no
    // extra exchange. TaskFanout (default 1 — the 4× multi-wave
    // experiment measured strictly worse here; see TaskFanout's
    // scaladoc for the A/B).
    val n = sets.sparkSession.sessionState.conf.numShufflePartitions
    val prefixes =
      prefixesOf(sets, tNum, tDen, maxPrefixLen)
        .repartition(n * TaskFanout, col("g"))
    // candidate equi-join on prefix shingles, plus the standard length
    // filter: J >= t forces t*|A| <= |B| (I <= |B| and I >= t*|A|), so
    // size-incompatible pairs drop inside the join instead of reaching
    // the verify stage.
    //
    // FIRST-SHARED-PREFIX enumeration, not join-then-DISTINCT: a clone
    // family shares its whole (rarest-first) prefix, so every family
    // pair used to reach the DISTINCT once per shared prefix shingle —
    // ~40x duplication that spilled the x100 gate's disk dry. A pair
    // now emits only at the earliest shared prefix shingle under the
    // global (frequency, shingle) order: any common shingle u ordered
    // before this row's g sits at a lower rank than g on BOTH sides
    // (same global order), and both ranks are inside the prefixes, so
    // u is in both pe arrays — "pe_x and pe_y share nothing" picks
    // exactly one join key per pair. pe-vs-pe, never the full prefix
    // array, which therefore is not carried at all (it doubled the
    // per-doc shuffle payload — the quadratic-payload finding).
    //
    // POSITIONAL filter (PPJoin, Xiao et al. WWW'08): at the first
    // shared shingle every common shingle is at rank >= rn on each
    // side, so overlap <= 1 + min(n_x - rn_x, n_y - rn_y), while
    // J >= tNum/tDen forces (tNum+tDen)*I >= tNum*(n_x+n_y) —
    // candidates whose positional bound cannot reach that die on
    // three integer ops BEFORE the arrays_overlap scan and the fat
    // set-intersection verify. Pure pruning: the bound is an upper
    // bound on the true overlap, so every dropped candidate would
    // have failed the verify — the emitted pair set (and oracle hash)
    // is unchanged by theorem, and the naive-equivalence specs
    // re-check it empirically.
    val positional =
      lit(tNum + tDen) *
        (lit(1) + least(col("x.n") - col("x.rn"), col("y.n") - col("y.rn"))) >=
        lit(tNum) * (col("x.n") + col("y.n"))
    prefixes.as("x")
      .join(prefixes.as("y"),
        col("x.g") === col("y.g") && col("x.doc_id") < col("y.doc_id") &&
          col("y.n") * tDen >= col("x.n") * tNum &&
          col("x.n") * tDen >= col("y.n") * tNum &&
          positional &&
          !arrays_overlap(col("x.pe"), col("y.pe")))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
  }

  /** The shared shingle stage: the fused one-pass distinct-shingle
    * kernel (the composed split+transform+array_distinct form measured
    * ~10x slower; its set-equality is ShingleKernelSpec-pinned), then
    * 64-bit hashes: every later stage — explode, frequency, prefix
    * shuffle, candidate join, verify intersect — moves and compares
    * longs instead of shingle strings (measured ~2x end-to-end). Set
    * SIZES are preserved short of a 64-bit collision inside one
    * comparison (~1e-11 at a 10^5-shingle vocabulary, and
    * deterministic: the oracle hash compare would flag it loudly, not
    * silently). Returns (raw string sets, hashed sets) — both keyed
    * `doc_id`, column `shingles` / `s`. */
  private[graft] def shingleSets(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int): (DataFrame, DataFrame) = {
    val raw = NearDup
      .docShingles(df.select(col(idCol).as("doc_id"), col(textCol)),
        "doc_id", textCol, NearDup.Params(shingleSize = k))
    // SORTED ascending, once per doc: the verify stage's two-pointer
    // intersect kernel requires it, the prefix stages don't care (they
    // explode), and the n-log-n is corpus-linear vs the candidate-
    // linear work it deletes
    val sets = raw.select(col("doc_id"),
      sort_array(transform(col("shingles"), g => xxhash64(g))).as("s"))
    (raw, sets)
  }

  /** The (doc_id, n, g, rn, pe) prefix rows the candidate stage
    * equi-joins on: explode the hashed shingle sets, attach global
    * frequencies, keep each doc's `|d| - ceil(t*|d|) + 1` RAREST
    * shingles. `rn` is this shingle's rank within the doc under the
    * global (frequency, shingle) order (the positional filter's
    * input) and `pe` the doc's prefix shingles strictly before this
    * row's `g` in that order (the first-shared-prefix test's input) —
    * the full prefix array is NOT carried (pe-vs-pe suffices, see
    * [[selfJoin]]), halving a per-doc payload that is inherently
    * O(prefixLen^2) in Sum(rn-1); corpora with 10^5-shingle documents
    * should segment them upstream (the chunking operator) before
    * near-dup joining. Factored so the skew spec can assert
    * structurally that hot shingles stay out of prefixes
    * (rarest-first ranks them last). */
  private def prefixesOf(
      sets: DataFrame,
      tNum: Int,
      tDen: Int,
      maxPrefixLen: Int): DataFrame = {
    // explode_outer, NOT explode: a plain explode lets the optimizer
    // infer `size(s) > 0 AND isnotnull(s)` below the Generate, and
    // pushing that predicate through the projection re-materializes the
    // shingle kernel into each conjunct — THREE kernel evaluations per
    // row in the scan-side Filter (size, isnotnull, projection; visible
    // in the round-6 PLANS.md dump). explode_outer infers nothing, so
    // the kernel stays a single projection evaluated once per row
    // (JaccardJoinSpec pins the count), and the null row an empty
    // shingle array would emit is dropped by a cheap attribute-only
    // filter on the generator output. size(s) rides BELOW the Generate
    // so exploded rows carry (doc_id, n, g), never the array itself.
    val exploded = sets
      .select(col("doc_id"), size(col("s")).as("n"), explode_outer(col("s")).as("g"))
      .where(col("g").isNotNull)
    // one map-combined aggregation: the global shingle frequency that
    // defines the (rarest-first) prefix order. The frequency table is
    // O(vocabulary): small enough that AQE broadcasts the join at test
    // scale, but a 100 TB corpus's shingle vocabulary is NOT broadcast-
    // small — no hint, so the attach degrades to a keyed shuffle join
    // exactly when it must.
    val freq = exploded.groupBy("g").agg(count(lit(1)).as("f"))
    // prefix length |d| - ceil(t*|d|) + 1, all-integer:
    // ceil(a*n/b) = (a*n + b - 1) DIV b
    val prefixLen =
      col("n") - expr(s"(n * $tNum + ${tDen - 1}) DIV $tDen") + lit(1)
    // ONE doc-keyed ObjectHashAggregate realizes the whole prefix table
    // (round-16 optimization; guide §2.4 "remove shuffles outright"):
    // sort_array over the collected (f, g) structs IS the global
    // (frequency, shingle) total order the previous shape ranked by —
    // ties are impossible within a doc (shingle sets are distinct), so
    // array position ≡ row_number. The replaced shape paid, per
    // selfJoin: a full per-partition Sort + Window rank pass over the
    // exploded corpus, a SECOND Sort + Window pass under the
    // prefix-array collect (AQE reuses the doc_id exchange but each
    // consumer re-sorts and re-ranks above it — measured in the final
    // adaptive plan, plans/r16/q_ngram_jaccard_before.txt), and the
    // ranked⋈prefixArrays join-back. Now the doc_id exchange feeds one
    // aggregation and posexplode re-derives rank (`rn` = position) and
    // `pe` (the strictly-earlier slice) with no Sort, no Window and no
    // join anywhere in the prefix build.
    val prefixArrays = exploded
      .join(freq, "g")
      .groupBy(col("doc_id"), col("n"))
      .agg(slice(
        transform(sort_array(collect_list(struct(col("f"), col("g")))),
          s => s.getField("g")),
        lit(1), prefixLen.cast("int")).as("p"))
      // the enforced payload bound (see DefaultMaxPrefixLen): a doc
      // whose prefix exceeds the cap fails the query loudly BEFORE its
      // O(prefix^2) pe payload reaches the candidate exchange — now ONE
      // int comparison per DOC (the replaced shape checked per prefix
      // row; the trigger condition is identical — size(p) = prefixLen)
      .where(isnull(assert_true(
        size(col("p")) <= lit(maxPrefixLen),
        concat(
          lit("JaccardJoin: document "), col("doc_id").cast("string"),
          lit(s" has a prefix longer than maxPrefixLen = $maxPrefixLen; "),
          lit("its pe payload grows with prefix^2 — segment long documents "),
          lit("upstream (the chunking operator) or raise maxPrefixLen deliberately")))))
    // pe = the shingles strictly before this row's g in the prefix
    // order, materialized ONCE per prefix row — the candidate join
    // evaluates only arrays_overlap(x.pe, y.pe) per joined row, never
    // a per-candidate slice allocation (candidate rows outnumber
    // prefix rows by the clone-family duplication factor)
    prefixArrays
      .select(col("doc_id"), col("n"), col("p"),
        posexplode(col("p")).as(Seq("__pos", "g")))
      .select(col("doc_id"), col("n"), col("g"),
        (col("__pos") + 1).as("rn"),
        slice(col("p"), lit(1), col("__pos")).as("pe"))
  }

  /** Spec window into the candidate stage: the prefix rows [[selfJoin]]
    * would join for this corpus and threshold. */
  private[graft] def prefixTable(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      tNum: Int,
      tDen: Int,
      maxPrefixLen: Int = DefaultMaxPrefixLen): DataFrame =
    prefixesOf(shingleSets(df, idCol, textCol, k)._2, tNum, tDen, maxPrefixLen)

  /** Reference formulation for the equivalence spec: every pair, no
    * filter — O(n^2), test-scale only. */
  private[graft] def naiveSelfJoin(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 3,
      tNum: Int = 3,
      tDen: Int = 5): DataFrame = {
    val sets = df.select(
      col(idCol).as("doc_id"),
      array_distinct(
        NearDup.shinglesFromTokens(split(col(textCol), " ", -1),
          col(textCol), k)).as("s"))
    val inter = size(array_intersect(col("sa"), col("sb")))
    sets.select(col("doc_id").as("doc_a"), col("s").as("sa"))
      .join(sets.select(col("doc_id").as("doc_b"), col("s").as("sb")),
        col("doc_a") < col("doc_b"))
      .select(
        col("doc_a"), col("doc_b"),
        inter.as("n_common"),
        (size(col("sa")) + size(col("sb")) - inter).as("n_union"))
      .where(lit(tDen) * col("n_common") >= lit(tNum) * col("n_union"))
  }
}
