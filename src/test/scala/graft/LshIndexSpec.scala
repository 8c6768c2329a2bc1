package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.Euclidean
import graft.operators.{FlatKnn, LshIndex}

/** LSH invariants on real sf0.001 data (reference lsh.py semantics:
  * bucket probe + exact re-rank + under-k full-scan fallback).
  */
class LshIndexSpec extends SparkSpec {

  private val p = LshIndex.Params()
  private lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").cache()
  private lazy val q0: Seq[Float] =
    emb.where(col("vec_id") === 0).select("embedding").head().getSeq[Float](0)

  test("self-query: the query's own vector is always a candidate and ranks first") {
    // identical vector → identical signatures in every table → in-bucket
    val top = LshIndex.search(emb, q0, 10, p).head()
    assert(top.getAs[Long]("vec_id") === 0L)
    assert(math.abs(top.getAs[Double]("dist")) < 1e-9)
  }

  test("returns exactly k rows, sorted by (dist, id)") {
    val rows = LshIndex.search(emb, q0, 10, p).collect()
    assert(rows.length === 10)
    val pairs = rows.map(r => (r.getAs[Double]("dist"), r.getAs[Long]("vec_id")))
    assert(pairs.sameElements(pairs.sortBy(identity)))
  }

  test("approximate recall@10 vs exact is sane (>= 0.3) and <= 1") {
    val exact = FlatKnn.search(emb, q0, 10).collect().map(_.getAs[Long]("vec_id")).toSet
    val approx = LshIndex.search(emb, q0, 10, p).collect().map(_.getAs[Long]("vec_id")).toSet
    val recall = exact.intersect(approx).size / 10.0
    assert(recall >= 0.3, s"recall@10 = $recall")
  }

  test("under-k fallback: a quiet bucket falls back to the full corpus (lsh.py:199-202)") {
    // 16-bit signatures over only 20 vectors: buckets almost surely hold
    // < k vectors, so the fallback must kick in and return exact results.
    val sparse = LshIndex.Params(hashSize = 16, numTables = 1, tag = "lsh-sparse")
    val tiny = emb.where(col("vec_id") < 20).cache()
    val got = LshIndex.search(tiny, q0, 10, sparse).collect().map(_.getAs[Long]("vec_id"))
    val exact = FlatKnn.search(tiny, q0, 10).collect().map(_.getAs[Long]("vec_id"))
    assert(got.sameElements(exact))
    tiny.unpersist()
  }

  test("fused signature expression equals the composition form bitwise") {
    val ps = LshIndex.planes(p)
    val rows = emb.limit(50)
      .select(
        LshIndex.signatureCol(col("embedding"), ps(0)).as("fused"),
        LshIndex.signatureColBuiltin(col("embedding"), ps(0)).as("builtin"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("signatureCol (Catalyst) agrees with signatureLocal (driver) on real vectors") {
    val ps = LshIndex.planes(p)
    val rows = emb
      .limit(25)
      .select(col("vec_id"), col("embedding"),
        LshIndex.signatureCol(col("embedding"), ps(0)).as("s0"),
        LshIndex.signatureCol(col("embedding"), ps(3)).as("s3"))
      .collect()
    rows.foreach { r =>
      val v = r.getAs[scala.collection.Seq[Float]]("embedding").toArray
      assert(r.getAs[Long]("s0") === LshIndex.signatureLocal(v, ps(0)))
      assert(r.getAs[Long]("s3") === LshIndex.signatureLocal(v, ps(3)))
    }
  }

  test("searchWithTable (prebuilt signature table) matches inline search") {
    val sigTable = LshIndex.signatureTable(emb, p).cache()
    assert(sigTable.count() === emb.count() * p.numTables)
    val viaTable = LshIndex.searchWithTable(emb, sigTable, q0, 10, p)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("dist")))
    val inline = LshIndex.search(emb, q0, 10, p)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("dist")))
    assert(viaTable.sameElements(inline))
    sigTable.unpersist()
  }

  test("signatures are within [0, 2^hashSize)") {
    val sigTable = LshIndex.signatureTable(emb, p)
    val mm = sigTable.agg(min("sig"), max("sig")).head()
    assert(mm.getLong(0) >= 0L && mm.getLong(1) < (1L << p.hashSize))
  }

  test("multiProbe: hamming-ball expansion (reference K7, lsh.py:355-376)") {
    val probes = LshIndex.multiProbe(sig = 0xA5L, hashSize = 8, maxFlips = 2)
    // C(8,0) + C(8,1) + C(8,2) = 1 + 8 + 28 distinct signatures
    assert(probes.length === 37)
    assert(probes.contains(0xA5L))
    assert(probes.forall(s => java.lang.Long.bitCount(s ^ 0xA5L) <= 2))
    assert(probes.distinct.length === probes.length)
  }

  test("multi-probe rescues a sparse under-k probe from the corpus-scan fallback") {
    // the q_lsh_multiprobe fixture: every 23rd vector, k=5. The base
    // probe holds FEWER than k candidates (the fallback predicate would
    // fire); one flip per table holds >= k — so the multi-probe search
    // provably answers from buckets alone, and the proof is the result
    // equality against an exact re-rank restricted to the candidate set.
    val corpus = emb.where(pmod(col("vec_id"), lit(23)) === 0).cache()
    try {
      val k = 5
      val sigTable = LshIndex.signatureTable(corpus, p).cache()
      val querySigs = LshIndex.planes(p).map(LshIndex.signatureLocal(q0.toArray, _))
      val base = LshIndex
        .prunedCandidateIds(sigTable, querySigs, "vec_id").count()
      val widened = LshIndex
        .prunedCandidateIds(sigTable, querySigs, "vec_id", p.hashSize, maxFlips = 1)
      val widenedIds = widened.collect().map(_.getLong(0))
      assert(base < k, s"fixture drift: base probe holds $base >= k=$k candidates")
      assert(widenedIds.length >= k,
        s"fixture drift: 1-flip probe holds ${widenedIds.length} < k=$k candidates")
      // candidates-only exact re-rank == the wired multi-probe search
      val expected = FlatKnn
        .search(corpus.where(col("vec_id").isin(widenedIds.toIndexedSeq: _*)), q0, k)
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
      val got = LshIndex
        .search(corpus, q0, k, p.copy(maxFlips = 1))
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
      assert(got.sameElements(expected),
        "multi-probe result differs from the candidates-only exact re-rank")
      sigTable.unpersist()
    } finally corpus.unpersist()
  }
}
