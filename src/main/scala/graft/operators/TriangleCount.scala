package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Triangle / wedge counting over an undirected edge set — the graph
  * health probe behind q_triangle_count (clusters of near-duplicates
  * are cliques, so the closure rate closed/wedges tells whether the
  * pair generator catches groups or only chains).
  *
  * Scale shape (the x100 lesson, round 12): count wedges from per-vertex
  * DEGREE PRODUCTS (one aggregation) and triangles by the EDGE-ITERATOR
  * form — per normalized edge (a,b), |up(a) ∩ up(b)| counts each
  * triangle exactly once at its lexicographically lowest edge. The
  * exchanges move |E| edge rows carrying bounded adjacency arrays, never
  * the wedge stream (~1e9 rows at x100 vs 27 M edges; the join-based
  * wedge count materialized that stream TWICE: 292 s → 40 s measured).
  * Both adjacency attaches are SHUFFLE_HASH (never sort the
  * array-carrying stream) with pinned parallelism (AQE sizes coalescing
  * from the few-hundred-MB input, not the intersect work above it).
  *
  * `maxDegree` is an ENFORCED fail-fast bound, not advice (the
  * capBuckets / JaccardJoin discipline): the adjacency arrays are
  * bounded here only if the edge set's degrees are — the near-dup edge
  * artifact bounds them by construction (bands × maxBucket), but a
  * foreign edge set with a hub vertex would otherwise blow a task
  * buffer silently and skew the intersect stage. One linear
  * `assert_true` per vertex makes the assumption loud.
  */
object TriangleCount {

  /** (n_edges, n_wedges, n_triangles) of the undirected graph given by
    * `edges` (any orientation, duplicates tolerated — normalized to
    * distinct a<b internally). Fails loudly when any vertex's
    * upper-neighbor count exceeds `maxDegree`. */
  def counts(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      maxDegree: Int): (Long, Long, Long) = {
    require(maxDegree > 0, s"maxDegree must be positive: $maxDegree")
    val s = edges.sparkSession
    val n = s.sessionState.conf.numShufflePartitions
    // persist: e feeds FOUR separate actions (edge count, wedge
    // aggregate, adjacency build, and the closing join reads it twice),
    // and shuffle reuse does not span actions — without materialization
    // the scan+distinct shuffle of the full edge set replays four times,
    // and at x100 (27 M edges) those repeated ~GB shuffle writes were
    // the query's dominant VARIANCE term (solo quiet median-of-4 read
    // 69.9 s with a 58 s spread at flat calib; materialized once, 29 s).
    // persist over localCheckpoint (round-14 advisor): the cached plan
    // keeps its lineage, so an executor loss recomputes the lost blocks
    // instead of failing the job (the 1000-executor story), the
    // compressed-columnar cache of two long columns is smaller than the
    // checkpoint's serialized rows, and the blocking unpersist in the
    // finally actually frees the blocks — a checkpointed RDD's blocks
    // are invisible to Dataset.unpersist, so repeated counts() calls in
    // one JVM (bench passes) pinned ~GB per pass at x100.
    val e = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      countsOn(e, n, maxDegree)
    } finally {
      // blocking, so the blocks are truly gone before the caller's next
      // pass starts (non-blocking unpersist would let bench passes
      // overlap eviction IO with the next timed region)
      e.unpersist(blocking = true)
    }
  }

  /** [[counts]] over an edge set the CALLER guarantees is already
    * normalized (src < dst per row) and duplicate-free — e.g. the
    * near-dup pair artifact, whose first-collision generator emits each
    * canonical pair exactly once. Skipping the normalize means NO
    * distinct shuffle and NO materialization at all: each of the four
    * actions re-scans the (columnar, pruned) source, which is
    * read-only and variance-free, where the generic path's per-call
    * ~GB shuffle + cache write was the dominant residual variance of
    * the x100 gate row EVEN materialized once (committed 36.5 ±
    * 13.2 s round 14; persisted-once 19.3 s median but a warm pass
    * still spiked +21 s on the write burst). The guarantee is CHECKED,
    * not trusted: a per-row `assert_true(src < dst)` rides the first
    * projection (orientation/self-loop violations fail loudly), and
    * the adjacency build asserts sorted-neighbor uniqueness (adjacent
    * equal pair ⇒ duplicate edge) before the arrays fan out. */
  def countsNormalized(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      maxDegree: Int): (Long, Long, Long) = {
    require(maxDegree > 0, s"maxDegree must be positive: $maxDegree")
    val s = edges.sparkSession
    val n = s.sessionState.conf.numShufflePartitions
    val e = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .where(isnull(assert_true(
        col(srcCol) < col(dstCol),
        concat(
          lit("TriangleCount.countsNormalized: edge ("),
          col(srcCol).cast("string"), lit(", "), col(dstCol).cast("string"),
          lit(") violates the src < dst contract — pass a normalized " +
            "edge set or use counts()")))))
    countsOn(e, n, maxDegree, checkDuplicates = true)
  }

  /** The four actions over a normalized edge set. */
  private def countsOn(
      e: DataFrame,
      n: Int,
      maxDegree: Int,
      checkDuplicates: Boolean = false): (Long, Long, Long) = {
    val nE = e.count()
    // a wedge a<b<c picks one lower and one upper neighbor of its
    // middle vertex: n_wedges = sum over b of lo(b) * up(b)
    val nW = e.select(explode(array(
        struct(col("a").as("v"), lit(0L).as("lo"), lit(1L).as("up")),
        struct(col("b").as("v"), lit(1L).as("lo"), lit(0L).as("up")))).as("d"))
      .groupBy(col("d.v"))
      .agg(sum("d.lo").as("lo"), sum("d.up").as("up"))
      .agg(coalesce(sum(col("lo") * col("up")), lit(0L)).as("w"))
      .head().getLong(0)
    // upper-adjacency arrays, sorted for a deterministic layout; an
    // edge whose endpoints have no upper neighbors contributes 0, so
    // the inner joins drop nothing the sum would count. The degree cap
    // is checked HERE, once per vertex (linear), before the arrays fan
    // out onto |E| edge rows.
    val adjBase = e.groupBy(col("a").as("v"))
      .agg(sort_array(collect_list(col("b"))).as("nb"))
      .where(isnull(assert_true(
        size(col("nb")) <= lit(maxDegree),
        concat(
          lit("TriangleCount: vertex "), col("v").cast("string"),
          lit(" has upper-degree "), size(col("nb")).cast("string"),
          lit(s" > maxDegree = $maxDegree — the adjacency-array shape " +
            "assumes bounded degrees (pass the bound the edge set was " +
            "actually built under, e.g. bands * maxBucket for the " +
            "near-dup artifact)")))))
    // duplicate-edge check for the normalized (no-distinct) path: the
    // neighbor list is sorted, so duplicates are ADJACENT — one O(d)
    // zip of the list against itself shifted by one, once per vertex,
    // before the arrays fan out onto |E| edge rows
    val adj =
      if (!checkDuplicates) adjBase
      else adjBase.where(isnull(assert_true(
        size(col("nb")) <= 1 || !array_contains(
          zip_with(
            slice(col("nb"), lit(1), size(col("nb")) - 1),
            slice(col("nb"), lit(2), size(col("nb")) - 1),
            (x, y) => x === y),
          true),
        concat(
          lit("TriangleCount.countsNormalized: vertex "),
          col("v").cast("string"),
          lit(" has a duplicate edge — the caller promised a " +
            "duplicate-free edge set (use counts() to normalize)")))))
    val nT = e.repartition(n, col("a"))
      .join(adj.select(col("v").as("a"), col("nb").as("__na"))
        .hint("SHUFFLE_HASH"), Seq("a"))
      .repartition(n, col("b"))
      .join(adj.select(col("v").as("b"), col("nb").as("__nb"))
        .hint("SHUFFLE_HASH"), Seq("b"))
      // the adjacency arrays are sort_array'd longs, so the overlap is
      // the two-pointer SortedIntersectCount walk — no per-edge hash
      // set or intersection-array materialization (same kernel and
      // rationale as the Jaccard verifies; counts identical)
      .select(org.apache.spark.sql.graft.ColumnBridge.column(
        graft.functions.SortedIntersectCount(
          org.apache.spark.sql.graft.ColumnBridge.expression(col("__na")),
          org.apache.spark.sql.graft.ColumnBridge.expression(col("__nb"))))
        .cast("long").as("t"))
      .agg(coalesce(sum("t"), lit(0L)).as("t"))
      .head().getLong(0)
    (nE, nW, nT)
  }
}
