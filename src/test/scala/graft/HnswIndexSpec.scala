package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.Cosine
import graft.operators.{FlatKnn, HnswIndex}

/** HNSW invariants on real sf0.001 embeddings. HNSW is approximate —
  * tests assert recall floors and structural properties, not goldens
  * (SURVEY.md §7.2.8). */
class HnswIndexSpec extends SparkSpec {

  private lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").cache()
  private lazy val index = HnswIndex.fromDataFrame(emb)
  private lazy val q0: Array[Float] =
    emb.where(col("vec_id") === 0).select("embedding").head().getSeq[Float](0).toArray

  test("builds over the full table") {
    assert(index.size === emb.count().toInt)
    assert(index.entry.isDefined)
  }

  test("self-query: stored vector is its own nearest neighbor at distance 0") {
    val top = index.search(q0, 1)
    assert(top.head._1 === 0L)
    assert(math.abs(top.head._2) < 1e-6)
  }

  test("recall@10 vs exact cosine ranking is high (>= 0.8)") {
    // HNSW ranks euclidean-over-normalized == cosine ordering
    val exact = FlatKnn.search(emb, q0.toSeq, 10, Cosine)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    val approx = index.search(q0, 10).map(_._1).toSet
    val recall = exact.intersect(approx).size / 10.0
    assert(recall >= 0.8, s"recall@10 = $recall")
  }

  test("results are sorted by (dist, id) and exactly k") {
    val res = index.search(q0, 10)
    assert(res.length === 10)
    assert(res === res.sortBy(t => (t._2, t._1)))
  }

  test("deterministic: two builds over the same data return identical results") {
    val again = HnswIndex.fromDataFrame(emb)
    assert(index.search(q0, 10) === again.search(q0, 10))
  }

  test("over-knee corpora redirect: fromDataFrameOpt None above maxRows, Some at it") {
    // the driver-build window is bounded by BUILD TIME (the measured
    // ~2 ms/insert curve behind DefaultMaxRows), so the Option form is
    // the auto-path contract: None hands the caller to searchPartitioned
    assert(HnswIndex.fromDataFrameOpt(emb, maxRows = 10).isEmpty)
    val small = HnswIndex.fromDataFrameOpt(emb.limit(10), maxRows = 10)
    assert(small.exists(_.size === 10))
    // the hard form still refuses loudly
    val ex = intercept[IllegalArgumentException] {
      HnswIndex.fromDataFrame(emb, maxRows = 10)
    }
    assert(ex.getMessage.contains("searchPartitioned"))
  }

  test("small-n: returns all vectors ranked when n <= k") {
    val tiny = HnswIndex.build(
      Iterator((1L, Array(1f, 0f)), (2L, Array(0f, 1f)), (3L, Array(1f, 1f))))
    val res = tiny.search(Array(1f, 0f), 10)
    assert(res.length === 3)
    assert(res.head._1 === 1L)
  }

  test("delete: removed id never returned; entry point re-elected (A5)") {
    val idx = HnswIndex.build(
      (0L until 50L).iterator.map(i =>
        (i, Array.tabulate(8)(d => math.sin(i * 31 + d).toFloat))))
    val ep = idx.entry.get
    idx.delete(ep)
    assert(idx.entry.isDefined && idx.entry.get != ep)
    assert(idx.size === 49)
    assert(!idx.search(Array.fill(8)(0.1f), 49).exists(_._1 == ep))
    // surviving entry is a max-level node
    val maxLvl = (0L until 50L).filter(_ != ep).map(idx.levelOf).max
    assert(idx.levelOf(idx.entry.get) === maxLvl)
  }

  test("update: re-added vector is findable at its new position") {
    val idx = HnswIndex.build(
      (0L until 30L).iterator.map(i =>
        (i, Array.tabulate(4)(d => ((i + d) % 7).toFloat + 1f))))
    idx.update(5L, Array(100f, 100f, 100f, 100f))
    // normalized direction of (100,100,100,100) == (1,1,1,1)
    val res = idx.search(Array(1f, 1f, 1f, 1f), 1)
    assert(res.head._1 === 5L)
  }

  test("restore mid-stream: serialize + keep mutating == never serialized, bitwise") {
    // the export/restore contract is stronger than a static round-trip:
    // a restored graph must also MUTATE identically — adjacency buffer
    // order and the persisted next-ordinal drive future prunes and level
    // draws, so any divergence shows up as a different graph. Randomized
    // add/delete/update streams applied to both twins after the
    // serialization point must leave them bit-identical.
    val rnd = new scala.util.Random(7)
    def vec() = Array.fill(6)(rnd.nextFloat() * 2f - 1f)
    val initial = (0L until 40L).map(i => (i, vec()))
    val live = new HnswIndex(m = 4, efConstruction = 20, maxLevel = 3, seed = 11L)
    initial.foreach { case (i, v) => live.add(i, v) }
    val restored = HnswIndex.restore(
      live.exportNodes.iterator, live.entry, live.nextOrdinal,
      m = 4, efConstruction = 20, maxLevel = 3, seed = 11L)
    // same mutation stream against both
    val ops: Seq[HnswIndex => Unit] =
      (40L until 60L).map(i => { val v = vec(); (x: HnswIndex) => x.add(i, v) }) ++
        Seq(3L, 17L, 41L, 8L, 55L).map(i => (x: HnswIndex) => x.delete(i)) ++
        Seq(5L, 44L).map(i => { val v = vec(); (x: HnswIndex) => x.update(i, v) })
    ops.foreach { op => op(live); op(restored) }
    assert(live.entry === restored.entry)
    assert(live.nextOrdinal === restored.nextOrdinal)
    val (na, nb) = (live.exportNodes, restored.exportNodes)
    assert(na.map(_._1) === nb.map(_._1))
    na.zip(nb).foreach { case ((id, va, la, aa), (_, vb, lb, ab)) =>
      assert(va.toSeq === vb.toSeq, s"vector of $id")
      assert(la === lb, s"level of $id")
      assert(aa.map(_.toSeq).toSeq === ab.map(_.toSeq).toSeq, s"adjacency of $id")
    }
    val probe = vec()
    assert(live.search(probe, 10) === restored.search(probe, 10))
  }

  test("delete via reverse-references leaves no dangling edges and the back-ref index never drifts") {
    // the O(in-degree) delete relies on backRefs == the referrer sets
    // derivable from the adjacency lists; any drift under a randomized
    // add/delete/update churn would leave a pruned-but-referenced or
    // deleted-but-listed node behind
    val rnd = new scala.util.Random(23)
    def vec() = Array.fill(6)(rnd.nextFloat() * 2f - 1f)
    val idx = new HnswIndex(m = 4, efConstruction = 20, maxLevel = 3, seed = 5L)
    (0L until 80L).foreach(i => idx.add(i, vec()))
    assert(idx.backRefsConsistent, "back-refs drifted during build")
    val deleted = scala.collection.mutable.Set.empty[Long]
    rnd.shuffle((0 until 80).map(_.toLong).toVector).take(30).foreach { i =>
      idx.delete(i); deleted += i
    }
    (80L until 95L).foreach(i => idx.add(i, vec()))
    Seq(2L, 81L, 40L).filterNot(deleted).foreach(i => idx.update(i, vec()))
    assert(idx.backRefsConsistent, "back-refs drifted under churn")
    // no surviving adjacency list references a deleted node
    idx.exportNodes.foreach { case (id, _, _, nbrs) =>
      nbrs.foreach(_.foreach(c =>
        assert(!deleted.contains(c), s"node $id still lists deleted $c")))
    }
  }

  test("searchPartitioned: distributed batch probe returns k rows per query with high recall") {
    val q1 = emb.where(col("vec_id") === 7).select("embedding").head().getSeq[Float](0).toArray
    val out = HnswIndex
      .searchPartitioned(emb, Seq((0L, q0), (7L, q1)), k = 10)
      .collect()
    val byQ = out.groupBy(_.getAs[Long]("qid"))
    assert(byQ.keySet === Set(0L, 7L))
    byQ.values.foreach(rows => assert(rows.length === 10))
    // each query's own vector is its top hit
    assert(byQ(0L).minBy(r => r.getAs[Double]("dist")).getAs[Long]("id") === 0L)
    assert(byQ(7L).minBy(r => r.getAs[Double]("dist")).getAs[Long]("id") === 7L)
  }

  test("partitioned artifact: restored-graph search is exact and rebuild-deterministic") {
    val dir = java.nio.file.Files.createTempDirectory("graft-hnswart-").toString
    try {
      HnswIndex.buildPartitionedArtifact(emb, s"$dir/g1", numParts = 8)
      val q1 = emb.where(col("vec_id") === 7).select("embedding").head().getSeq[Float](0).toArray
      val got = HnswIndex
        .searchArtifact(spark, s"$dir/g1", Seq((0L, q0), (7L, q1)), k = 10)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy(t => (t._1, t._3, t._2))
      // exactly 10 rows per query, own vector first (the oracle-hash
      // query q_hnsw_artifact pins full exactness; this spec pins shape
      // + determinism)
      val byQ = got.groupBy(_._1)
      assert(byQ.keySet === Set(0L, 7L))
      byQ.values.foreach(rows => assert(rows.length === 10))
      assert(byQ(0L).minBy(_._3)._2 === 0L)
      assert(byQ(7L).minBy(_._3)._2 === 7L)
      // rebuild determinism: a second build answers bit-identically
      HnswIndex.buildPartitionedArtifact(emb, s"$dir/g2", numParts = 8)
      val again = HnswIndex
        .searchArtifact(spark, s"$dir/g2", Seq((0L, q0), (7L, q1)), k = 10)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy(t => (t._1, t._3, t._2))
      assert(got.toSeq === again.toSeq)
      // and the artifact rows themselves are identical across builds
      val a1 = spark.read.parquet(s"$dir/g1").orderBy("part", "ord")
        .collect().map(_.toString).toSeq
      val a2 = spark.read.parquet(s"$dir/g2").orderBy("part", "ord")
        .collect().map(_.toString).toSeq
      assert(a1 === a2)
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }
}
