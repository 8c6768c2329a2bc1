package graft.operators

import scala.collection.mutable

/** Hierarchical Navigable Small World index — the Spark-native stance on
  * the reference's `HNSWIndexer` (`/root/reference/app/core/indexers/
  * hnsw.py`: insert 91-211, greedy descent 308-327, bounded best-first
  * `_search_level` 415-487, neighbor select 489-495, delete + entry
  * re-election 213-270, level sampling 405-413).
  *
  * HNSW is anti-Spark by construction (sequential, mutation-heavy,
  * pointer-chasing — SURVEY.md §7.4.1), so this is deliberately PLAIN
  * SCALA, driver- or executor-local, behind the [[VectorIndex]] trait:
  *  - driver-local for a whole "in-mem"-scope library (the reference's
  *    own operating envelope);
  *  - executor-local inside `mapPartitions` for the distributed batch
  *    path ([[HnswIndex.searchPartitioned]]): each partition builds its
  *    own graph once per query batch, answers every query locally, and
  *    the per-partition top-k unions into a global
  *    `TakeOrderedAndProject` — no graph ever crosses an executor
  *    boundary, queries ship as a broadcast-sized array.
  *
  * Reference semantics kept: vectors are L2-normalized on insert and
  * query (hnsw.py:116,300 — euclidean over normalized vectors ≡ cosine
  * ordering); level ~ floor(-ln(U) * (1/ln 2)) capped at maxLevel;
  * search(ef = max(k, efConstruction)); n <= k returns everything.
  * Deterministic: the level RNG is seeded per (seed, insertion ordinal),
  * so the same build inputs give the same graph on every build.
  */
class HnswIndex(
    val m: Int = 16,
    val efConstruction: Int = 200,
    val maxLevel: Int = 4,
    val seed: Long = 42L) {

  private val levelMult = 1.0 / math.log(2.0)
  // node id → (normalized vector, level)
  private val vectors = mutable.LinkedHashMap.empty[Long, Array[Float]]
  private val levels = mutable.HashMap.empty[Long, Int]
  // neighbors(level)(node) = connected node ids
  private val neighbors =
    Array.fill(maxLevel + 1)(mutable.HashMap.empty[Long, mutable.ArrayBuffer[Long]])
  // backRefs(level)(node) = nodes whose adjacency lists CONTAIN `node`.
  // Maintained alongside `neighbors` (edges can be asymmetric after
  // pruning, so a node's referrers are NOT just its own neighbors) so
  // [[delete]] touches only the in-degree referrers instead of scanning
  // every node's list — O(in-degree · degree), not O(n · degree).
  private val backRefs =
    Array.fill(maxLevel + 1)(mutable.HashMap.empty[Long, mutable.HashSet[Long]])
  private var entryPoint: Option[Long] = None
  private var insertOrdinal: Long = 0L

  private def addBackRef(l: Int, target: Long, from: Long): Unit =
    backRefs(l).getOrElseUpdate(target, mutable.HashSet.empty) += from

  private def dropBackRef(l: Int, target: Long, from: Long): Unit =
    backRefs(l).get(target).foreach { s =>
      s -= from
      if (s.isEmpty) backRefs(l).remove(target)
    }

  /** Spec hook: the reverse-reference index must always equal the one
    * derived from the adjacency lists — any drift would make [[delete]]
    * leave dangling edges. */
  private[graft] def backRefsConsistent: Boolean =
    (0 to maxLevel).forall { l =>
      val derived = mutable.HashMap.empty[Long, mutable.HashSet[Long]]
      neighbors(l).foreach { case (from, conns) =>
        conns.foreach(c =>
          derived.getOrElseUpdate(c, mutable.HashSet.empty) += from)
      }
      derived == backRefs(l)
    }

  def size: Int = vectors.size
  def entry: Option[Long] = entryPoint
  def levelOf(id: Long): Int = levels(id)

  private def normalize(v: Array[Float]): Array[Float] = {
    var ss = 0.0
    var i = 0
    while (i < v.length) { ss += v(i).toDouble * v(i); i += 1 }
    val n = math.sqrt(ss)
    if (n == 0.0) v.clone()
    else {
      val out = new Array[Float](v.length)
      i = 0
      while (i < v.length) { out(i) = (v(i) / n).toFloat; i += 1 }
      out
    }
  }

  private def dist(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) {
      val d = a(i).toDouble - b(i)
      s += d * d
      i += 1
    }
    math.sqrt(s)
  }

  /** Deterministic level draw (hnsw.py:405-413): floor(-ln(U)*mult),
    * capped. U is a function of (seed, ordinal) so rebuilds reproduce. */
  private def drawLevel(): Int = {
    val rng = new scala.util.Random(seed ^ (insertOrdinal * 0x9E3779B97F4A7C15L))
    insertOrdinal += 1
    val u = rng.nextDouble() match { case 0.0 => Double.MinPositiveValue; case x => x }
    math.min(maxLevel, math.floor(-math.log(u) * levelMult).toInt)
  }

  /** Bounded best-first search at one level (hnsw.py:415-487): expand the
    * closest unexpanded candidate, keep a result set capped at ef. */
  private def searchLevel(
      q: Array[Float],
      entries: Seq[Long],
      ef: Int,
      level: Int): mutable.PriorityQueue[(Double, Long)] = {
    val visited = mutable.HashSet.empty[Long]
    // candidates: min-heap by dist (scala PQ is max-heap → negate)
    val candidates = mutable.PriorityQueue.empty[(Double, Long)](
      Ordering.by[(Double, Long), Double](_._1).reverse)
    // results: max-heap by dist, size-capped at ef
    val results = mutable.PriorityQueue.empty[(Double, Long)](
      Ordering.by[(Double, Long), Double](_._1))
    entries.foreach { e =>
      if (visited.add(e)) {
        val d = dist(q, vectors(e))
        candidates.enqueue((d, e))
        results.enqueue((d, e))
      }
    }
    while (results.size > ef) results.dequeue()
    while (candidates.nonEmpty) {
      val (cd, c) = candidates.dequeue()
      if (results.size >= ef && cd > results.head._1) {
        candidates.clear() // nothing closer can remain
      } else {
        neighbors(level).getOrElse(c, mutable.ArrayBuffer.empty).foreach { nb =>
          if (visited.add(nb)) {
            val d = dist(q, vectors(nb))
            if (results.size < ef || d < results.head._1) {
              candidates.enqueue((d, nb))
              results.enqueue((d, nb))
              if (results.size > ef) results.dequeue()
            }
          }
        }
      }
    }
    results
  }

  /** Greedy single-step descent through one level (hnsw.py:308-327). */
  private def greedyStep(q: Array[Float], start: Long, level: Int): Long = {
    var cur = start
    var curDist = dist(q, vectors(cur))
    var improved = true
    while (improved) {
      improved = false
      neighbors(level).getOrElse(cur, mutable.ArrayBuffer.empty).foreach { nb =>
        val d = dist(q, vectors(nb))
        if (d < curDist) { cur = nb; curDist = d; improved = true }
      }
    }
    cur
  }

  /** Max connections per node: 2m at level 0, m above (standard HNSW). */
  private def maxConn(level: Int): Int = if (level == 0) 2 * m else m

  private def connect(a: Long, b: Long, level: Int): Unit = {
    val na = neighbors(level).getOrElseUpdate(a, mutable.ArrayBuffer.empty)
    if (!na.contains(b)) { na += b; addBackRef(level, b, a) }
    val nb = neighbors(level).getOrElseUpdate(b, mutable.ArrayBuffer.empty)
    if (!nb.contains(a)) { nb += a; addBackRef(level, a, b) }
    // prune over-connected nodes to their closest maxConn neighbors
    // (simple distance selection, hnsw.py:489-495)
    Seq(a, b).foreach { n =>
      val conns = neighbors(level)(n)
      val cap = maxConn(level)
      if (conns.length > cap) {
        val pruned = conns
          .map(c => (dist(vectors(n), vectors(c)), c))
          .sortBy(t => (t._1, t._2))
          .take(cap)
          .map(_._2)
        val kept = pruned.toSet
        conns.foreach(c => if (!kept.contains(c)) dropBackRef(level, c, n))
        neighbors(level)(n) = mutable.ArrayBuffer(pruned.toSeq: _*)
      }
    }
  }

  /** Insert one vector (hnsw.py:91-211). */
  def add(id: Long, vec: Array[Float]): Unit = {
    require(!vectors.contains(id), s"duplicate id: $id")
    val v = normalize(vec)
    val level = drawLevel()
    vectors(id) = v
    levels(id) = level
    entryPoint match {
      case None => entryPoint = Some(id)
      case Some(ep) =>
        var cur = ep
        val epLevel = levels(ep)
        // greedy descent through levels above the new node's level
        var l = epLevel
        while (l > level) { cur = greedyStep(v, cur, l); l -= 1 }
        // ef-bounded search + connect at each level from min(level, epLevel) down
        var entries = Seq(cur)
        l = math.min(level, epLevel)
        while (l >= 0) {
          val found = searchLevel(v, entries, efConstruction, l)
          val sorted = found.toSeq.sortBy(t => (t._1, t._2))
          sorted.take(m).foreach { case (_, nb) => connect(id, nb, l) }
          entries = sorted.map(_._2)
          l -= 1
        }
        if (level > epLevel) entryPoint = Some(id)
    }
  }

  /** Top-k approximate nearest neighbors. Distances are euclidean over
    * L2-NORMALIZED vectors (≡ cosine ordering, hnsw.py:116,300). */
  def search(query: Array[Float], k: Int, ef: Int = -1): Seq[(Long, Double)] = {
    if (vectors.isEmpty) return Seq.empty
    val q = normalize(query)
    // small-n shortcut (hnsw.py:295-297) — but ranked, unlike the
    // reference's unranked quirk (documented divergence: ranked output
    // is strictly more useful and the reference's own tests accept it)
    if (vectors.size <= k)
      return vectors.toSeq
        .map { case (id, v) => (id, dist(q, v)) }
        .sortBy(t => (t._2, t._1))
    // an explicit ef is clamped to k (standard HNSW): a caller's
    // ef < k would silently truncate the result set below k
    val effectiveEf = if (ef > 0) math.max(ef, k) else math.max(k, efConstruction)
    val ep = entryPoint.get
    var cur = ep
    var l = levels(ep)
    while (l > 0) { cur = greedyStep(q, cur, l); l -= 1 }
    searchLevel(q, Seq(cur), effectiveEf, 0).toSeq
      .map { case (d, id) => (id, d) }
      .sortBy(t => (t._2, t._1))
      .take(k)
  }

  /** Delete a node; if it was the entry point, re-elect the max-level
    * survivor (A5, hnsw.py:213-270). The maintained reverse-reference
    * sets make this O(in-degree · degree) — only the nodes that LIST
    * the deleted id are touched, never a scan of every node's
    * adjacency (the round-8 implementation's O(n · degree) crawl). */
  def delete(id: Long): Unit = {
    require(vectors.contains(id), s"unknown id: $id")
    vectors.remove(id)
    val lvl = levels.remove(id).getOrElse(0)
    (0 to lvl).foreach { l =>
      // forward edges out of id: its neighbors lose their back-reference
      neighbors(l).remove(id).foreach(_.foreach(c => dropBackRef(l, c, id)))
      // reverse edges into id: exactly the referrer set
      backRefs(l).remove(id).foreach(_.foreach { x =>
        neighbors(l).get(x).foreach { conns =>
          val i = conns.indexOf(id)
          if (i >= 0) conns.remove(i)
        }
      })
    }
    if (entryPoint.contains(id)) {
      // max-level (min-id tie-break) survivor in ONE pass — a sort here
      // would make every entry-point delete (and every update() of the
      // entry node) O(n log n) plus a full tuple materialization
      entryPoint =
        if (vectors.isEmpty) None
        else Some(levels.minBy { case (n, l) => (-l, n) }._1)
    }
  }

  /** Update = delete + re-add (hnsw.py:272-282). */
  def update(id: Long, vec: Array[Float]): Unit = { delete(id); add(id, vec) }

  /** Serialization view of the graph, in insertion order: (node id,
    * NORMALIZED vector, level, neighbors for levels 0..level in buffer
    * order). Buffer order is part of the contract — a restored graph
    * must prune/append against the same order a live one would — so
    * [[HnswIndex.restore]] of this view followed by further mutations is
    * bit-identical to never having serialized at all (the reference
    * round-trips its graph the same way, hnsw.py:372-401
    * save_to_dict/load_from_dict). */
  def exportNodes: Seq[(Long, Array[Float], Int, Array[Array[Long]])] =
    vectors.iterator.map { case (id, v) =>
      val lvl = levels(id)
      val nbrs = Array.tabulate(lvl + 1)(l =>
        neighbors(l).getOrElse(id, mutable.ArrayBuffer.empty).toArray)
      (id, v, lvl, nbrs)
    }.toSeq

  /** Ordinal the next [[add]] will draw its level from — persisted so a
    * restored graph's future level draws match a never-serialized one's. */
  def nextOrdinal: Long = insertOrdinal
}

object HnswIndex {

  /** Build from in-order (id, vector) pairs. */
  def build(
      data: Iterator[(Long, Array[Float])],
      m: Int = 16,
      efConstruction: Int = 200,
      maxLevel: Int = 4,
      seed: Long = 42L): HnswIndex = {
    val idx = new HnswIndex(m, efConstruction, maxLevel, seed)
    data.foreach { case (id, v) => idx.add(id, v) }
    idx
  }

  /** Driver-local graph size knee: beyond this, auto paths redirect to
    * [[searchPartitioned]] ([[fromDataFrameOpt]] returns None; the
    * catalog's hnsw read path does the same). The value is a
    * MEASUREMENT, not a guess — tools/HnswBuildCurve on real corpus
    * vectors (dim 32, m=16, efC=200) shows the single-threaded insert
    * loop near-linear at ~2 ms/insert (2k→3.6s, 5k→9.9s, 10k→20.3s,
    * 20k→38.0s; SCALING.md records the curve), so 5,000 bounds any one
    * driver build at ~10 s. Memory was the OLD rationale for a 2M cap;
    * build TIME binds three orders of magnitude earlier. Callers that
    * deliberately want the reference's whole-corpus in-memory envelope
    * (its own operating scope) pass maxRows explicitly. */
  val DefaultMaxRows: Int = 5000

  /** Reconstruct a graph from an [[HnswIndex.exportNodes]] dump (vectors
    * ALREADY normalized). Nodes must arrive in their original insertion
    * order; `entry` and `nextOrd` restore the exact mutable state, so
    * search AND any later add/delete behave bit-identically to the
    * never-serialized graph. */
  def restore(
      nodes: Iterator[(Long, Array[Float], Int, Array[Array[Long]])],
      entry: Option[Long],
      nextOrd: Long,
      m: Int = 16,
      efConstruction: Int = 200,
      maxLevel: Int = 4,
      seed: Long = 42L): HnswIndex = {
    val idx = new HnswIndex(m, efConstruction, maxLevel, seed)
    nodes.foreach { case (id, vec, lvl, nbrs) =>
      require(lvl <= maxLevel, s"node $id level $lvl exceeds maxLevel $maxLevel")
      require(nbrs.length == lvl + 1,
        s"node $id: ${nbrs.length} adjacency lists for level $lvl")
      idx.vectors(id) = vec
      idx.levels(id) = lvl
      var l = 0
      while (l <= lvl) {
        idx.neighbors(l)(id) = mutable.ArrayBuffer(nbrs(l).toSeq: _*)
        nbrs(l).foreach(c => idx.addBackRef(l, c, id))
        l += 1
      }
    }
    idx.entryPoint = entry
    idx.insertOrdinal = nextOrd
    idx
  }

  /** Driver-local build from a DataFrame — bounded collect, matching the
    * reference's in-memory scope. Refuses silently-unscalable use. */
  def fromDataFrame(
      df: org.apache.spark.sql.DataFrame,
      idCol: String = "vec_id",
      embCol: String = "embedding",
      maxRows: Int = DefaultMaxRows,
      m: Int = 16,
      efConstruction: Int = 200,
      seed: Long = 42L): HnswIndex =
    fromDataFrameOpt(df, idCol, embCol, maxRows, m, efConstruction, seed)
      .getOrElse(throw new IllegalArgumentException(
        s"HNSW driver-local build capped at $maxRows rows; " +
          "use searchPartitioned for larger corpora"))

  /** [[fromDataFrame]] that REDIRECTS instead of refusing: None when
    * the corpus exceeds `maxRows` — the caller takes the distributed
    * per-partition path ([[searchPartitioned]]) there, exactly the
    * catalog's over-cap behavior. The bounded `limit(maxRows + 1)`
    * collect is both the size check and the build input: never a
    * separate count job, never an unbounded collect. */
  def fromDataFrameOpt(
      df: org.apache.spark.sql.DataFrame,
      idCol: String = "vec_id",
      embCol: String = "embedding",
      maxRows: Int = DefaultMaxRows,
      m: Int = 16,
      efConstruction: Int = 200,
      seed: Long = 42L): Option[HnswIndex] = {
    val rows = df
      .select(idCol, embCol)
      .limit(maxRows + 1)
      .collect()
    if (rows.length > maxRows) None
    else Some(build(
      rows.iterator.map(r =>
        (r.getLong(0), r.getSeq[Float](1).toArray)),
      m, efConstruction, seed = seed))
  }

  /** Build the distributed index ONCE: hash-partition the corpus by id,
    * build one graph per partition (sorted-by-id insertion, so the
    * artifact is a pure function of the data and the partition count),
    * and persist every graph as parquet rows
    * `(part, ord, id, vec, level, nbrs, entry)` partitioned by `part`.
    * [[searchArtifact]] then RESTORES the graphs instead of re-running
    * the O(n log n) insert sequence per query batch — the same
    * build-once / probe-many economics as the LSH signature table and
    * IVF assignments, applied to the graph path (and the same shape the
    * catalog's single-graph `hnsw_graph` artifact uses). `entry` and the
    * row count carry each graph's restore state; vectors are stored
    * NORMALIZED, exactly as the in-memory graph holds them. */
  def buildPartitionedArtifact(
      df: org.apache.spark.sql.DataFrame,
      path: String,
      numParts: Int = 32,
      idCol: String = "vec_id",
      embCol: String = "embedding",
      m: Int = 16,
      efConstruction: Int = 200,
      seed: Long = 42L,
      maxLevel: Int = 4): Unit = {
    val spark = df.sparkSession
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    df.select(col(idCol), col(embCol))
      .repartition(numParts, col(idCol))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val part = org.apache.spark.TaskContext.getPartitionId()
        // deterministic insertion order within the partition: sorted ids
        // (the hash distribution fixes WHICH ids are here; the sort fixes
        // the level-draw sequence) — rebuilds are bit-identical
        val rows = it.toArray.sortBy(_._1)
        if (rows.isEmpty) Iterator.empty
        else {
          val idx = build(rows.iterator, m, efConstruction, maxLevel, seed)
          val entry = idx.entry.get
          // ALL build parameters ride WITH the artifact — maxLevel too:
          // a restore assuming the default would reject any node above
          // it (restore's lvl <= maxLevel require) the moment a
          // non-default build exists
          idx.exportNodes.iterator.zipWithIndex.map {
            case ((id, vec, lvl, nbrs), ord) =>
              (part, ord.toLong, id, vec.toSeq, lvl,
                nbrs.map(_.toSeq).toSeq, entry, m, efConstruction, seed,
                maxLevel)
          }
        }
      }
      .toDF("part", "ord", "id", "vec", "level", "nbrs", "entry",
        "m", "efc", "seed", "max_level")
      .write.mode("overwrite").partitionBy("part").parquet(path)
  }

  /** The shared per-query global top-k merge over per-partition
    * candidate rows (qid, id, dist): window-ranked by (dist, id) —
    * deterministic tie-break — and truncated to k. One definition for
    * every partitioned probe path ([[searchArtifact]],
    * [[searchPartitioned]], [[searchPartitionedKeyed]],
    * [[probeGraphRowsKeyed]]); the ordering IS the result contract, so
    * it must never fork. */
  private def globalTopK(
      perPartition: org.apache.spark.sql.DataFrame,
      k: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy("qid").orderBy(col("dist").asc, col("id").asc)
    perPartition
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .drop("rk")
  }

  /** Probe a [[buildPartitionedArtifact]] index: one keyed pass groups
    * each partition's graph rows, RESTORES the graph (no distance
    * computations, no inserts), answers the whole broadcast query batch
    * against it, and a global per-query top-k merges the per-partition
    * candidates — [[searchPartitioned]] semantics at a fraction of its
    * per-batch cost for static corpora. Per-task memory is one
    * partition's graph, the same envelope the build already required. */
  def searchArtifact(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      queries: Seq[(Long, Array[Float])],
      k: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val qBc = spark.sparkContext.broadcast(queries)
    // explicit fixed-N repartition + in-task grouping on the DATA part
    // key (see [[partitionedGraphRowsKeyed]]'s parallelism note): AQE
    // would coalesce a groupByKey exchange over these ~100 MB-at-x100
    // rows to 1-2 partitions and serialize the per-partition restores.
    val n = spark.sessionState.conf.numShufflePartitions
    val art = spark.read.parquet(path)
      .select(col("part").cast("int"), col("ord"), col("id"),
        col("vec"), col("level"), col("nbrs"), col("entry"),
        col("m"), col("efc"), col("seed"), col("max_level"))
      .repartition(n, col("part"))
      .as[(Int, Long, Long, Array[Float], Int, Seq[Seq[Long]], Long, Int, Int, Long, Int)]
    val perPartition = art
      .mapPartitions(_.toArray.groupBy(_._1).iterator.flatMap { case (_, rows) =>
        val sorted = rows.sortBy(_._2)
        val idx = restore(
          sorted.iterator.map { case (_, _, id, vec, lvl, nbrs, _, _, _, _, _) =>
            (id, vec, lvl, nbrs.map(_.toArray).toArray)
          },
          entry = Some(sorted.head._7),
          nextOrd = sorted.length.toLong,
          m = sorted.head._8,
          efConstruction = sorted.head._9,
          maxLevel = sorted.head._11,
          seed = sorted.head._10)
        qBc.value.iterator.flatMap { case (qid, qv) =>
          idx.search(qv, k).map { case (id, d) => (qid, id, d) }
        }
      })
      .toDF("qid", "id", "dist")
    globalTopK(perPartition, k)
  }

  /** The distributed batch path: per-partition graphs, each answering
    * every query in the (broadcast) batch, merged by a global top-k.
    * Output: (qid, id, dist) with exactly k rows per query. For static
    * corpora probed repeatedly, [[buildPartitionedArtifact]] +
    * [[searchArtifact]] amortize the graph builds across batches. */
  def searchPartitioned(
      df: org.apache.spark.sql.DataFrame,
      queries: Seq[(Long, Array[Float])],
      k: Int,
      idCol: String = "vec_id",
      embCol: String = "embedding",
      m: Int = 16,
      efConstruction: Int = 200,
      seed: Long = 42L): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val qBc = spark.sparkContext.broadcast(queries)
    val perPartition = df
      .select(idCol, embCol)
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val idx = build(it, m, efConstruction, seed = seed)
        qBc.value.iterator.flatMap { case (qid, qv) =>
          idx.search(qv, k).map { case (id, d) => (qid, id, d) }
        }
      }
      .toDF("qid", "id", "dist")
    globalTopK(perPartition, k)
  }

  /** [[buildPartitionedArtifact]] for STRING-keyed corpora (the
    * catalog's chunk ids), returned as ROWS instead of written to a
    * path so the catalog can persist them through its own versioned
    * artifact machinery. Each partition's graph is built over LOCAL
    * ordinals (0..n-1 in sorted-key insertion order — deterministic:
    * the id-hash repartition fixes WHICH keys land where, the sort
    * fixes the level-draw sequence) and every row carries its original
    * string key, so [[probeGraphRowsKeyed]] can map candidates back.
    * All build parameters ride with the rows, exactly like the
    * Long-keyed artifact. */
  def partitionedGraphRowsKeyed(
      df: org.apache.spark.sql.DataFrame,
      numParts: Int,
      idCol: String = "id",
      embCol: String = "embedding",
      m: Int = 16,
      efConstruction: Int = 200,
      seed: Long = 42L,
      maxLevel: Int = 4): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // the part id comes from the DATA (pmod of a 64-bit id hash), never
    // from TaskContext.getPartitionId(): a downstream writer is free to
    // coalesce or re-plan this frame (the catalog's small-artifact path
    // coalesces to one task), and a physical partition id would then
    // label every slice 0 — four graphs colliding on one part key, a
    // garbled restore. Grouping is in-task by that data key after an
    // EXPLICIT fixed-N repartition, so graph membership is a pure
    // function of the ids at ANY physical layout.
    //
    // The explicit repartition (not groupByKey) is load-bearing for
    // PARALLELISM, the capBuckets lesson applied to compute-heavy
    // mapGroups: the input is ~100 MB at 500 k rows, so AQE sized the
    // groupByKey exchange from bytes alone and coalesced it to ONE
    // partition — every per-partition graph then built SERIALLY in one
    // task (measured at x100: 571 s for an over-cap createLibrary,
    // ~32x the single-graph build; jstack showed one executor thread in
    // HnswIndex.add). A user repartition with an explicit count is
    // AQE-exempt; hash collisions of numParts keys into numParts
    // partitions leave some tasks 2-4 groups — still ~16x, and the
    // in-task grouping keys on the DATA so any residual merging or
    // downstream re-plan changes scheduling, never membership.
    df.select(
        col(idCol).cast("string").as("__id"),
        col(embCol).as("__emb"),
        pmod(xxhash64(col(idCol).cast("string")), lit(numParts))
          .cast("int").as("__part"))
      .repartition(numParts, col("__part"))
      .as[(String, Array[Float], Int)]
      .mapPartitions { it =>
        it.toArray.groupBy(_._3).iterator.flatMap { case (part, group) =>
          val rows = group.sortBy(_._1)
          val idx = build(
            rows.iterator.zipWithIndex.map { case ((r, i)) => (i.toLong, r._2) },
            m, efConstruction, maxLevel, seed)
          val entry = idx.entry.get
          idx.exportNodes.iterator.map { case (ord, vec, lvl, nbrs) =>
            (part, ord, rows(ord.toInt)._1, vec.toSeq, lvl,
              nbrs.map(_.toSeq).toSeq, entry, m, efConstruction, seed,
              maxLevel)
          }
        }
      }
      .toDF("part", "ord", "id", "vec", "level", "nbrs", "entry",
        "m", "efc", "seed", "max_level")
  }

  /** Probe [[partitionedGraphRowsKeyed]] rows: RESTORE each partition's
    * graph (no inserts, no distance computations) and answer the whole
    * broadcast query batch against it, then a global per-query top-k —
    * [[searchArtifact]] for the string-keyed catalog shape. Probing a
    * just-built rows frame is bit-identical to probing the same frame
    * read back off parquet (restore is a pure function of the rows), so
    * the catalog's artifact-present and build-fallback redirect paths
    * return the same candidates by construction.
    *
    * DELIBERATELY a sibling of [[searchArtifact]], not a unification:
    * the Long-keyed artifact persists graphs noded on REAL ids with
    * numeric-sorted insertion order, while these rows node on local
    * ordinals with STRING-sorted keys — merging them would either
    * change a persisted layout or change an insertion order, and both
    * orders sit under measured-recall exact-hash oracles. Any change
    * to the restore parameters or the tie-break must be applied to
    * BOTH (the merge itself is shared — globalTopK). */
  def probeGraphRowsKeyed(
      art: org.apache.spark.sql.DataFrame,
      queries: Seq[(Long, Array[Float])],
      k: Int): org.apache.spark.sql.DataFrame = {
    val spark = art.sparkSession
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val qBc = spark.sparkContext.broadcast(queries)
    // explicit fixed-N repartition + in-task grouping on the DATA part
    // key, for the same reason as [[partitionedGraphRowsKeyed]]: the
    // graph rows are ~100 MB at x100, so AQE coalesces a groupByKey
    // exchange to 1-2 partitions and every per-partition restore runs
    // serially in one task. Grouping keys on the data, so scheduling
    // can never change which rows form a graph.
    val n = spark.sessionState.conf.numShufflePartitions
    val typed = art
      .select(col("part").cast("int"), col("ord"), col("id"),
        col("vec"), col("level"), col("nbrs"), col("entry"),
        col("m"), col("efc"), col("seed"), col("max_level"))
      .repartition(n, col("part"))
      .as[(Int, Long, String, Array[Float], Int, Seq[Seq[Long]], Long, Int, Int, Long, Int)]
    val perPartition = typed
      .mapPartitions(_.toArray.groupBy(_._1).iterator.flatMap { case (_, rows) =>
        // node ids ARE the per-partition insertion ordinals, so the
        // sorted array doubles as the ord -> key map
        val sorted = rows.sortBy(_._2)
        val idx = restore(
          sorted.iterator.map { case (_, ord, _, vec, lvl, nbrs, _, _, _, _, _) =>
            (ord, vec, lvl, nbrs.map(_.toArray).toArray)
          },
          entry = Some(sorted.head._7),
          nextOrd = sorted.length.toLong,
          m = sorted.head._8,
          efConstruction = sorted.head._9,
          maxLevel = sorted.head._11,
          seed = sorted.head._10)
        qBc.value.iterator.flatMap { case (qid, qv) =>
          idx.search(qv, k).map { case (ord, d) => (qid, sorted(ord.toInt)._3, d) }
        }
      })
      .toDF("qid", "id", "dist")
    globalTopK(perPartition, k)
  }

  /** [[searchPartitioned]] for STRING-keyed corpora (the catalog's chunk
    * ids): each partition builds its graph over local ordinals and maps
    * results back to the original keys — the redirect target for an
    * hnsw library grown past the driver-graph cap (see
    * LibraryCatalog.search), where collecting the corpus to one driver
    * graph stops being a 100 TB design. Deterministic for a fixed
    * committed version: partition contents and row order come from the
    * version's parquet files, and the global merge breaks distance ties
    * by id. */
  def searchPartitionedKeyed(
      df: org.apache.spark.sql.DataFrame,
      queries: Seq[(Long, Array[Float])],
      k: Int,
      idCol: String = "id",
      embCol: String = "embedding",
      m: Int = 16,
      efConstruction: Int = 200,
      seed: Long = 42L): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val qBc = spark.sparkContext.broadcast(queries)
    val perPartition = df
      .select(idCol, embCol)
      .as[(String, Array[Float])]
      .mapPartitions { it =>
        // local ordinals for the graph; the buffer maps them back (the
        // side-effecting map is safe: build() drains the iterator fully
        // before any search touches the buffer)
        val keys = new scala.collection.mutable.ArrayBuffer[String]
        val idx = build(
          it.map { case (key, v) => keys += key; (keys.length - 1L, v) },
          m, efConstruction, seed = seed)
        qBc.value.iterator.flatMap { case (qid, qv) =>
          idx.search(qv, k).map { case (ord, d) => (qid, keys(ord.toInt), d) }
        }
      }
      .toDF("qid", "id", "dist")
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy("qid").orderBy(col("dist").asc, col("id").asc)
    perPartition
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .drop("rk")
  }
}
