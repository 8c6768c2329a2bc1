package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The shared exactly-once candidate-enumeration kernel for every
  * bucketed near-dup path (MinHash bands, sign-LSH embedding tables,
  * SimHash chunks).
  *
  * Problem shape: a doc contributes one row per bucket index
  * (band / table / chunk) and candidates are pairs colliding in AT
  * LEAST one bucket. The naive join-then-DISTINCT emits a clone-family
  * pair once per agreeing bucket — an L-fold multiple of the true
  * candidate set flowing into a pair-keyed dedup exchange, measured at
  * x100 as the stage that OOM'd / disk-killed the gate (billions of
  * duplicate rows). Instead each pair is emitted ONLY at the first
  * bucket index (under the fixed 0..n-1 order) where BOTH docs survived
  * the giant-bucket cap and their keys agree: exactly one emission per
  * pair by construction, no dedup exchange at all.
  *
  * Two hard-won rules are baked in (see NearDupSpec's cap-stressed
  * fixtures and the round-10 dormant-bug writeup):
  *   - the earlier-collision predicate is STATICALLY UNROLLED over the
  *     (known, small) bucket count — higher-order functions
  *     (exists/sequence lambdas) are CodegenFallback and an interpreted
  *     per-candidate-row eval was the measured hot path at x100;
  *   - survival must be checked on BOTH sides before the key equality:
  *     with a map encoding, `m_a[t] === m_b[t]` is NULL when one side
  *     was capped out of bucket t, the NULL survives the OR, and the
  *     negated filter silently DROPS the pair — only when caps bind,
  *     which no small-scale gate exercises.
  */
object FirstCollision {

  /** The generic first-collision shape: did an earlier bucket t <
    * `idx` already emit this pair? Parameterized by the per-side
    * survival test and the key-agreement test so the map-carrying
    * paths (MinHash bands, embedding tables) and the bitmask path
    * (SimHash, whose rows already carry the full fingerprint) share
    * one predicate structure. All three callbacks must return
    * codegen-able, null-safe (never-NULL) columns. */
  def earlierCollision(
      idx: Column,
      numBuckets: Int,
      survivesA: Int => Column,
      survivesB: Int => Column,
      agreesAt: Int => Column): Column = {
    require(numBuckets > 0, s"numBuckets must be positive: $numBuckets")
    (0 until numBuckets)
      .map(t => (idx > t) && survivesA(t) && survivesB(t) && agreesAt(t))
      .reduce(_ || _)
  }

  /** Slot-encoding wrapper: `m` is a per-doc FIXED-WIDTH array of
    * numBuckets key slots, slot t null when the doc was capped out of
    * bucket t. An array beats the earlier map encoding twice over in
    * the one place this predicate runs — the candidate join's output
    * stream, per CANDIDATE row: element_at on an UnsafeArrayData slot
    * is O(1) where a map lookup scans its key array (numBuckets
    * compares per probe, x ~2·numBuckets probes per candidate), and
    * the fixed array is ~50 B narrower per probe-row side in the
    * pinned exchange. Both isNotNull guards are load-bearing — see
    * the class doc. (element_at on arrays is 1-BASED.) */
  def earlierCollisionMap(
      idx: Column,
      mapA: Column,
      mapB: Column,
      numBuckets: Int): Column =
    earlierCollision(
      idx,
      numBuckets,
      t => element_at(mapA, lit(t + 1)).isNotNull,
      t => element_at(mapB, lit(t + 1)).isNotNull,
      t => element_at(mapA, lit(t + 1)) === element_at(mapB, lit(t + 1)))

  /** Attach the per-doc survival map `__m` (bucketIdx -> key over the
    * rows that survived the cap) to every capped bucket row — as ONE
    * id-keyed aggregation whose map entries are re-exploded into the
    * probe rows. The map IS the survivor row set, so the explode
    * reproduces every (id, idx, key) row exactly; `capped` is consumed
    * once (the earlier groupBy + join-back shape consumed it twice,
    * which forced every caller to eagerly checkpoint its band lineage
    * — measured at sf0.1 as a 2x tax on the incremental path — and
    * paid a second id exchange for the join).
    *
    * `numBuckets` is VALIDATED against the data, not trusted: the
    * unrolled predicate is blind to buckets outside [0, numBuckets) —
    * an index above escapes the earlier-collision test forward, a
    * NEGATIVE one backward (idx > t is false for every t >= 0) — so a
    * first collision there would re-emit the pair once per such
    * bucket, silent duplicates. A row whose index is out of range
    * fails the query loudly instead (assert_true; one int comparison
    * per input row, linear not per-candidate). */
  def withSurvivalMap(
      capped: DataFrame,
      idCol: String,
      idxCol: String,
      keyCol: String,
      numBuckets: Int): DataFrame = {
    val guarded = capped.where(isnull(assert_true(
      col(idxCol) >= lit(0) && col(idxCol) < lit(numBuckets),
      concat(
        lit(s"FirstCollision: bucket index column '$idxCol' = "),
        col(idxCol).cast("string"),
        lit(s" outside [0, numBuckets = $numBuckets) — pass the bucket count the rows were actually built with")))))
    guarded
      .groupBy(col(idCol))
      .agg(map_from_entries(
        collect_list(struct(col(idxCol), col(keyCol)))).as("__mm"))
      .select(
        col(idCol),
        explode(col("__mm")).as(Seq(idxCol, keyCol)),
        // fixed-width slot array (see earlierCollisionMap): built once
        // per DOC here, read ~2·numBuckets times per CANDIDATE in the
        // join — the O(1)/narrow encoding pays where the rows multiply
        transform(
          sequence(lit(0), lit(numBuckets - 1)),
          t => element_at(col("__mm"), t)).as("__m"))
  }

  /** The full exactly-once candidate join between two probe frames
    * produced by [[withSurvivalMap]] (pass the same frame twice for a
    * self-join). Emits (outA, outB) pairs colliding in >= 1 bucket,
    * each exactly once, filtered by `keep` (e.g. `_ < _` for ordered
    * self-join pairs, `_ =!= _` for incremental batch-vs-corpus).
    *
    * `carryA`/`carryB` ((source column -> output name) renames) ride
    * per-DOC payload through the join onto the emitted pairs — the
    * verify-inline shape: when a payload small enough to ride the
    * probe rows (a fixed-width embedding, a norm scalar) is all the
    * verify stage needs, carrying it beats attaching it to the PAIR
    * stream afterwards the moment candidates outnumber the corpus
    * (measured at x100 on the embedding path: 62 M pairs x 2
    * SHUFFLE_HASH attaches of 128-byte vectors ≈ 18 GB of exchange,
    * vs ~1 GB to carry the vectors on the 8-rows/doc probe side).
    *
    * When payload is carried, both sides are explicitly repartitioned
    * on the join key with a FIXED partition count: the join's input is
    * a few hundred MB while its output is quadratic per bucket, and
    * AQE sizes post-shuffle coalescing from input bytes alone — the
    * capBuckets lesson, re-applied to the now-fatter candidate
    * exchange. A SHUFFLE_HASH hint keeps the fat probe rows unsorted
    * (build is rows-bytes / partitions per task, bounded). */
  def pairs(
      left: DataFrame,
      right: DataFrame,
      idCol: String,
      idxCol: String,
      keyCol: String,
      numBuckets: Int,
      outA: String,
      outB: String,
      keep: (Column, Column) => Column,
      carryA: Seq[(String, String)] = Nil,
      carryB: Seq[(String, String)] = Nil): DataFrame = {
    val a = left.select(
      col(idCol).as(outA) +: col(idxCol) +: col(keyCol) +:
        col("__m").as("__ma") +:
        carryA.map { case (src, dst) => col(src).as(dst) }: _*)
    val b = right.select(
      col(idCol).as(outB) +: col(idxCol) +: col(keyCol) +:
        col("__m").as("__mb") +:
        carryB.map { case (src, dst) => col(src).as(dst) }: _*)
    val carrying = carryA.nonEmpty || carryB.nonEmpty
    val n = left.sparkSession.sessionState.conf.numShufflePartitions
    def pin(df: DataFrame): DataFrame =
      if (carrying) df.repartition(n, col(idxCol), col(keyCol)) else df
    val joined =
      pin(a).join(
        if (carrying) pin(b).hint("SHUFFLE_HASH") else pin(b),
        Seq(idxCol, keyCol))
    joined
      .where(
        keep(col(outA), col(outB)) &&
          !earlierCollisionMap(col(idxCol), col("__ma"), col("__mb"), numBuckets))
      .select(
        col(outA) +: col(outB) +:
          (carryA.map(_._2) ++ carryB.map(_._2)).map(col): _*)
  }
}
