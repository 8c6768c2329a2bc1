package graft

import org.apache.spark.sql.functions._

import graft.operators.KMeans

/** KMeans pinned three ways: bit-for-bit partitioning invariance (the
  * point of integer-exact arithmetic), exact equality with a pure
  * driver-side Lloyd reimplementation, and the plan claims (assignment
  * is join- and shuffle-free; centroids are literals). */
class KMeansSpec extends SparkSpec {

  private lazy val emb = spark.read
    .parquet(s"$sfDir/embeddings.parquet")
    .select(col("vec_id"), KMeans.quantize(col("embedding")).as("x"))

  private lazy val init: IndexedSeq[IndexedSeq[Long]] =
    emb.where(col("vec_id") < 8).orderBy("vec_id")
      .collect()
      .map(_.getAs[scala.collection.Seq[Long]]("x").toIndexedSeq)
      .toIndexedSeq

  /** Pure-Scala Lloyd with the operator's exact arithmetic contract:
    * int64 distances, strict-< nearest (ties → lowest id), half-up
    * rounded integer means, empty clusters keep their centroid. */
  private def lloydLocal(
      xs: Array[Array[Long]],
      iters: Int): (IndexedSeq[IndexedSeq[Long]], Map[Int, (Long, Long)]) = {
    var cs: IndexedSeq[Array[Long]] = init.map(_.toArray)
    def nearest(x: Array[Long]): (Int, Long) = {
      var best = -1
      var bd = Long.MaxValue
      for (k <- cs.indices) {
        var d = 0L
        var i = 0
        while (i < x.length) { val t = x(i) - cs(k)(i); d += t * t; i += 1 }
        if (d < bd) { bd = d; best = k }
      }
      (best, bd)
    }
    for (_ <- 0 until iters) {
      val groups = xs.groupBy(x => nearest(x)._1)
      cs = cs.indices.map { k =>
        groups.get(k) match {
          case Some(g) =>
            val n = g.length.toLong
            Array.tabulate(g.head.length) { d =>
              val s = g.map(_(d)).sum
              math.floor((2.0 * s + n) / (2.0 * n)).toLong
            }
          case None => cs(k)
        }
      }
    }
    val fin = xs.map(nearest).groupBy(_._1)
      .map { case (k, a) => k -> (a.length.toLong, a.map(_._2).sum) }
    (cs.map(_.toIndexedSeq), fin)
  }

  test("fit is partitioning-invariant bit-for-bit") {
    val c1 = KMeans.fit(emb.repartition(1), "x", init, 2)
    val c7 = KMeans.fit(emb.repartition(7), "x", init, 2)
    assert(c1.map(_.toList) == c7.map(_.toList))
  }

  test("fit + assign equal the pure driver-side Lloyd") {
    val xs = emb.collect()
      .map(_.getAs[scala.collection.Seq[Long]]("x").toArray)
    val (expCs, expFin) = lloydLocal(xs, 2)
    val gotCs = KMeans.fit(emb, "x", init, 2)
    assert(gotCs.map(_.toList) == expCs.map(_.toList))
    val gotFin = KMeans.assign(emb, "x", gotCs)
      .groupBy("cid")
      .agg(count(lit(1)).as("n"), sum("dist").as("inertia"))
      .collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(gotFin == expFin)
    assert(gotFin.size > 1, "fixture must populate several clusters")
  }

  test("distance ties assign to the lowest centroid id") {
    val dup = Seq(init(0), init(0), init(1))
    val cids = KMeans.assign(emb, "x", dup)
      .select("cid").distinct().collect().map(_.getInt(0)).sorted
    assert(!cids.contains(1), "duplicate centroid must never win the tie")
  }

  test("an empty cluster keeps its previous centroid") {
    val far = IndexedSeq.fill(init(0).size)(10000000L)
    val cs = Seq(init(0), far)
    val next = KMeans.recenter(KMeans.assign(emb, "x", cs), "x", cs)
    assert(next(1) == far)
    assert(next(0) != init(0), "the populated cluster must move")
  }

  test("fused assignment equals the composed-builtin twin bitwise") {
    val a = KMeans.assign(emb, "x", init)
      .select("vec_id", "cid", "dist").orderBy("vec_id").collect().toSeq
    val b = KMeans.assignComposed(emb, "x", init)
      .select("vec_id", "cid", "dist").orderBy("vec_id").collect().toSeq
    assert(a.nonEmpty)
    assert(a == b)
  }

  test("a wrong-dimension vector assigns NULL, like the composition") {
    import spark.implicits._
    val bad = Seq((1L, Seq(1L, 2L)), (2L, init(0).toList))
      .toDF("vec_id", "x")
    val fused = KMeans.assign(bad, "x", init)
      .orderBy("vec_id").select("cid", "dist").collect()
    val comp = KMeans.assignComposed(bad, "x", init)
      .orderBy("vec_id").select("cid", "dist").collect()
    assert(fused(0).isNullAt(0) && fused(0).isNullAt(1))
    assert(comp(0).isNullAt(0) && comp(0).isNullAt(1))
    assert(!fused(1).isNullAt(0) && fused(1) == comp(1))
  }

  test("recenter ignores wrong-dimension (NULL-cid) rows instead of failing") {
    import spark.implicits._
    val mixed = Seq((1L, Seq(9L, 9L)), (2L, init(0).toList), (3L, init(1).toList))
      .toDF("vec_id", "x")
    val cs = Seq(init(0), init(1))
    val next = KMeans.recenter(KMeans.assign(mixed, "x", cs), "x", cs)
    assert(next.size == 2)
    assert(next(0) == init(0), "single-member cluster mean is itself")
  }

  test("assignment is join-free and shuffle-free; centroids are literals") {
    val plan = KMeans.assign(emb, "x", init)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    assert(!plan.contains("Exchange"), plan)
  }
}
