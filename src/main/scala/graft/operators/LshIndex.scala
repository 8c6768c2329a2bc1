package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{Embedder, VectorFunctions}

/** Random-hyperplane (cosine sign) LSH index — the Spark-native
  * re-expression of the reference's `LSHIndexer`
  * (`/root/reference/app/core/indexers/lsh.py`): hyperplane init
  * `lsh.py:312-327`, signature `lsh.py:329-353`, bucket probe
  * `lsh.py:189-195`, brute-force fallback when candidates < k
  * `lsh.py:199-202`, exact re-rank `lsh.py:204-213`.
  *
  * Differences from the reference, by design:
  *  - Hyperplanes are not drawn from a seeded Gaussian RNG but derived
  *    from md5 of `"tag|table|bit|dim"` (uniform in [-1, 1] per
  *    component). Determinism here must hold across THREE engines
  *    (Catalyst, driver-local Scala, the DuckDB oracle), and a hash
  *    derivation is the only generator all three can reproduce exactly.
  *    Random-direction quality is equivalent for sign-LSH purposes.
  *  - Signatures are ints (bit b set iff dot(v, plane_b) >= 0), not bit
  *    strings — an 8-byte shuffle key instead of a string.
  *
  * Scale design (100 TB): [[signatureTable]] materializes `(id,
  * table_idx, sig)` once per index build — written out partitioned by
  * `table_idx` and bucketed by `sig`, a probe reads only the L matching
  * buckets and never touches the full corpus; the inline path in
  * [[search]] (compute signatures during the scan) is the no-index
  * fallback and the correctness oracle's shape. Candidate re-rank is the
  * shuffle-free `TakeOrderedAndProject` top-k of [[FlatKnn]].
  */
object LshIndex {

  /** Reference defaults: hash_size=8, num_tables=10
    * (`app/config/indexer_hparams.py:18-20`). `dim` MUST equal the
    * indexed vector column's dimensionality (the testdata embeddings are
    * 64-d) — a shorter plane would silently zip_with-null-pad.
    *
    * `maxFlips` > 0 turns on MULTI-PROBE (K7, `lsh.py:355-376` — the
    * reference defines and unit-tests the expansion but never calls it
    * from search; here it is wired in as the opt-in it was meant to be):
    * each table probes every signature within Hamming distance
    * `maxFlips` of the query's, which rescues sparse buckets from the
    * under-k full-scan fallback — the one place the LSH path otherwise
    * degrades to O(corpus). Candidate volume grows by at most
    * sum_{i<=maxFlips} C(hashSize, i) per table (9x at 8 bits, 1 flip),
    * still bucket-bounded, never a scan. */
  case class Params(
      hashSize: Int = 8,
      numTables: Int = 10,
      dim: Int = 64,
      tag: String = "lsh",
      maxFlips: Int = 0)

  /** Hyperplane component (t = table, b = bit, d = dim), in [-1, 1].
    * Exact in all three engines: md5 prefix int % 2001 - 1000, / 1000. */
  def planeVal(p: Params, t: Int, b: Int, d: Int): Double =
    ((Embedder.md5IntLocal(s"${p.tag}|$t|$b|$d") % 2001L) - 1000L) / 1000.0

  /** planes(t)(b) = the b-th hyperplane of table t. */
  def planes(p: Params): Array[Array[Array[Double]]] =
    Array.tabulate(p.numTables, p.hashSize, p.dim)(planeVal(p, _, _, _))

  /** Driver-local signature of one vector for one table's planes.
    * Same ops in the same order as [[signatureCol]]: float→double cast,
    * left-to-right accumulation. */
  def signatureLocal(vec: Array[Float], tablePlanes: Array[Array[Double]]): Long =
    tablePlanes.zipWithIndex.map { case (pl, b) =>
      require(vec.length == pl.length, s"dim mismatch: vec ${vec.length} vs plane ${pl.length}")
      var dot = 0.0
      var d = 0
      while (d < pl.length) { dot += vec(d).toDouble * pl(d); d += 1 }
      if (dot >= 0.0) 1L << b else 0L
    }.sum

  /** Fused codegen signature column for one table (one loop over a
    * plane-matrix reference object — see [[graft.functions.LshSignature]]);
    * bit-identical to [[signatureColBuiltin]]. */
  def signatureCol(vec: Column, tablePlanes: Array[Array[Double]]): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(
      graft.functions.LshSignature(ColumnBridge.expression(vec), tablePlanes))
  }

  /** v0 composition form (zip_with/aggregate per plane) — kept as the
    * independently-written mirror for the equivalence test. NULL (not
    * 0L) for null/dim-mismatched vectors, matching the fused kernel:
    * the old `.otherwise(lit(0L))` swallowed the null-padded dot's NULL
    * into signature 0 — a LEGAL signature (all-negative dots), so an
    * invalid row written through this mirror would land in a real
    * bucket of every table and surface as a candidate. */
  def signatureColBuiltin(vec: Column, tablePlanes: Array[Array[Double]]): Column =
    tablePlanes.zipWithIndex.map { case (pl, b) =>
      val dot = aggregate(
        zip_with(vec, typedLit(pl.toSeq), (x, y) => x.cast("double") * y),
        lit(0.0),
        (acc, x) => acc + x)
      // two-sided when: a NULL dot stays NULL instead of taking the
      // otherwise-branch, and NULL propagates through the bit sum
      when(dot >= 0.0, lit(1L << b)).when(dot < 0.0, lit(0L))
    }.reduce(_ + _)

  /** The persistable index: one row per (id, table_idx, sig). Write this
    * partitioned by `table_idx`, bucketed by `sig`, and a probe becomes a
    * partition-pruned bucket read instead of a corpus scan. */
  def signatureTable(
      df: DataFrame,
      p: Params = Params(),
      idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame = {
    val ps = planes(p)
    val sigArray = array((0 until p.numTables).map(t => signatureCol(col(embCol), ps(t))): _*)
    df.select(col(idCol), posexplode(sigArray).as(Seq("table_idx", "sig")))
  }

  /** Candidate filter: any-table signature match with the query's
    * (multi-)probe set (the union over L bucket probes, lsh.py:189-195;
    * expansion lsh.py:355-376 when maxFlips > 0). */
  private def candidateCond(
      embCol: String,
      ps: Array[Array[Array[Double]]],
      querySigs: Array[Long],
      hashSize: Int,
      maxFlips: Int): Column =
    ps.indices
      .map { t =>
        val probes = multiProbe(querySigs(t), hashSize, maxFlips)
        signatureCol(col(embCol), ps(t)).isin(probes: _*)
      }
      .reduce(_ || _)

  /** Approximate top-k: probe buckets, re-rank candidates exactly, fall
    * back to a full scan when the candidate set is smaller than k. The
    * under-k branch is driver-side, mirroring the reference's
    * `if len(candidates) < k` (lsh.py:199-202).
    */
  def search(
      df: DataFrame,
      query: Seq[Float],
      k: Int,
      p: Params = Params(),
      metric: VectorFunctions.Metric = VectorFunctions.Euclidean,
      idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame = {
    require(query.length == p.dim, s"query dim ${query.length} != params dim ${p.dim}")
    val ps = planes(p)
    val querySigs = ps.map(signatureLocal(query.toArray, _))
    // localCheckpoint materializes the candidate set once (the signature
    // computation is numTables*hashSize dot products per row — not
    // something to evaluate twice for count + re-rank) and the blocks are
    // tiny: only bucket-matching rows survive the filter.
    val cands = df
      .where(candidateCond(embCol, ps, querySigs, p.hashSize, p.maxFlips))
      .localCheckpoint(true)
    val base = if (cands.count() >= k) cands else df
    FlatKnn.search(base, query, k, metric, idCol, embCol)
  }

  /** Candidate base from a prebuilt [[signatureTable]]: semi-join the
    * matching (table_idx, sig) buckets; full corpus when the buckets hold
    * fewer than k rows (lsh.py:199-202). Returns the DataFrame the exact
    * re-rank should run over — callers compose their own projection. */
  def candidateBase(
      df: DataFrame,
      sigTable: DataFrame,
      query: Seq[Float],
      k: Int,
      p: Params = Params(),
      idCol: String = "vec_id"): DataFrame = {
    val ps = planes(p)
    val querySigs = ps.map(signatureLocal(query.toArray, _))
    val probeCond = querySigs.zipWithIndex
      .map { case (s, t) =>
        col("table_idx") === t &&
          col("sig").isin(multiProbe(s, p.hashSize, p.maxFlips): _*)
      }
      .reduce(_ || _)
    val candIds = sigTable.where(probeCond).select(idCol).distinct()
    // shared under-k fallback (IvfIndex.candidatesOrAll): ONE copy of
    // the count-after-semi-join discipline across the lsh/ivf/pq paths
    IvfIndex.candidatesOrAll(df, candIds, k, idCol)
  }

  /** Partition-pruned probe of a PERSISTED signature table: one filtered
    * scan per table, each with `PartitionFilters [table_idx = t]` (when
    * the table was written `partitionBy("table_idx")`) and `sig = s_t`
    * pushed to parquet (row-group skipping; exact file skipping when
    * additionally bucketed by sig via `bucketBy(..., "sig")`). The single
    * OR-of-conjuncts scan of [[candidateBase]] cannot prune — every
    * disjunct mentions a different partition — so the scale path unions
    * L tiny pruned reads instead of one corpus-wide scan. */
  def prunedCandidateIds(
      sigTable: DataFrame,
      querySigs: Array[Long],
      idCol: String = "vec_id",
      hashSize: Int = 8,
      maxFlips: Int = 0): DataFrame =
    querySigs.zipWithIndex
      .map { case (s, t) =>
        // one partition-pruned scan per table; with multi-probe the sig
        // equality widens to an IN over the Hamming ball — still pushed
        // to parquet as an In filter, still one partition dir per table
        sigTable
          .where(col("table_idx") === t &&
            col("sig").isin(multiProbe(s, hashSize, maxFlips): _*))
          .select(idCol)
      }
      .reduce(_ union _)
      .distinct()

  /** [[candidateBase]] via [[prunedCandidateIds]] — for sig tables read
    * back from a table_idx-partitioned parquet write (the catalog's
    * layout). Same semantics, partition-pruned plan. */
  def candidateBasePruned(
      df: DataFrame,
      sigTable: DataFrame,
      query: Seq[Float],
      k: Int,
      p: Params = Params(),
      idCol: String = "vec_id"): DataFrame = {
    val querySigs = planes(p).map(signatureLocal(query.toArray, _))
    val candIds =
      prunedCandidateIds(sigTable, querySigs, idCol, p.hashSize, p.maxFlips)
    IvfIndex.candidatesOrAll(df, candIds, k, idCol)
  }

  /** Probe against a prebuilt [[signatureTable]], then exact re-rank —
    * the scale path. Routes through [[candidateBasePruned]]: the
    * catalog persists sig tables partitionBy("table_idx"), and the
    * single OR-of-conjuncts scan of [[candidateBase]] cannot
    * partition-prune (every disjunct names a different partition) — it
    * read all numTables × corpus sig rows per query where the pruned
    * form reads L tiny partition dirs. Identical candidate set either
    * way (same disjuncts, unioned instead of OR'd). */
  def searchWithTable(
      df: DataFrame,
      sigTable: DataFrame,
      query: Seq[Float],
      k: Int,
      p: Params = Params(),
      metric: VectorFunctions.Metric = VectorFunctions.Euclidean,
      idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame =
    FlatKnn.search(
      candidateBasePruned(df, sigTable, query, k, p, idCol),
      query, k, metric, idCol, embCol)

  /** Multi-probe signature expansion (reference K7, `lsh.py:355-376` —
    * defined and unit-tested there but never called by search): the
    * original signature plus every signature at Hamming distance <=
    * `maxFlips` obtained by flipping distinct bit subsets. */
  def multiProbe(sig: Long, hashSize: Int, maxFlips: Int): Seq[Long] = {
    def flips(start: Int, left: Int, cur: Long): Seq[Long] =
      if (left == 0) Seq(cur)
      else
        (start until hashSize).flatMap(b => flips(b + 1, left - 1, cur ^ (1L << b)))
    (0 to maxFlips).flatMap(f => flips(0, f, sig)).distinct
  }
}
