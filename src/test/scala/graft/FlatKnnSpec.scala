package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._
import graft.operators.FlatKnn

/** Flat exact kNN invariants over the real sf0.001 embeddings table
  * (reference invariants: test_library_save_load.py:136-148 self-query;
  * test_e2e.py:274-307 tag post-filter may return < k;
  * library_service.py:217-223 rank-vs-score metric quirk).
  */
class FlatKnnSpec extends SparkSpec {

  private lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").cache()
  private lazy val q0: Seq[Float] =
    emb.where(col("vec_id") === 0).select("embedding").head().getSeq[Float](0)

  test("self-query: nearest neighbor of a stored vector is itself at distance 0") {
    for (m <- Seq(Euclidean, Cosine, Manhattan)) {
      val top = FlatKnn.search(emb, q0, 1, m).head()
      assert(top.getAs[Long]("vec_id") === 0L, s"metric $m")
      assert(math.abs(top.getAs[Double]("dist")) < 1e-9, s"metric $m")
    }
  }

  test("returns exactly k rows when n >= k") {
    for (m <- Seq(Euclidean, Cosine, DotProduct, Manhattan))
      assert(FlatKnn.search(emb, q0, 7, m).count() === 7L)
  }

  test("under-k: returns all n rows when k > n (flat_index.py:96-108 semantics)") {
    val tiny = emb.where(col("vec_id") < 3)
    assert(FlatKnn.search(tiny, q0, 10).count() === 3L)
  }

  test("results are sorted ascending by (dist, id)") {
    val rows = FlatKnn.search(emb, q0, 20).collect()
    val pairs = rows.map(r => (r.getAs[Double]("dist"), r.getAs[Long]("vec_id")))
    assert(pairs.sameElements(pairs.sortBy(identity)))
  }

  test("top-k equals the k smallest distances of a full scan") {
    val k = 10
    val full = emb
      .select(col("vec_id"), distance(col("embedding"), typedLit(q0), Euclidean).as("dist"))
      .collect()
      .map(r => (r.getAs[Double]("dist"), r.getAs[Long]("vec_id")))
      .sortBy(identity)
      .take(k)
    val got = FlatKnn.search(emb, q0, k).collect()
      .map(r => (r.getAs[Double]("dist"), r.getAs[Long]("vec_id")))
    assert(got.sameElements(full))
  }

  test("searchWithScore: ranking is rankMetric order, score column is scoreMetric") {
    val k = 10
    val rows = FlatKnn.searchWithScore(emb, q0, k, Euclidean, Cosine).collect()
    val viaEuclid = FlatKnn.search(emb, q0, k, Euclidean).collect().map(_.getAs[Long]("vec_id"))
    assert(rows.map(_.getAs[Long]("vec_id")).sameElements(viaEuclid))
    // score equals the cosine distance computed independently for those ids
    val ids = rows.map(_.getAs[Long]("vec_id")).toSeq
    val cosById = emb
      .where(col("vec_id").isin(ids: _*))
      .select(col("vec_id"), distance(col("embedding"), typedLit(q0), Cosine).as("cd"))
      .collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("cd"))
      .toMap
    rows.foreach(r =>
      assert(math.abs(r.getAs[Double]("score") - cosById(r.getAs[Long]("vec_id"))) < 1e-9))
  }

  test("tag post-filter applied after top-k may return fewer than k (P1/T4)") {
    // reference semantics: filter the top-50 candidates, then re-truncate.
    val c50 = FlatKnn.searchWithColumns(emb, q0, 50, Euclidean, "vec_id", "embedding", Seq("label"))
    val filtered = c50.where(col("label") === 5).limit(10).collect()
    assert(filtered.length <= 10)
    // post-filter result is a subset of the pre-filter candidate ids
    val candidateIds = c50.collect().map(_.getAs[Long]("vec_id")).toSet
    assert(filtered.map(_.getAs[Long]("vec_id")).forall(candidateIds))
    // and differs from filter-then-topk whenever the label is rare enough
    val preFiltered = FlatKnn.search(emb.where(col("label") === 5), q0, 10)
    assert(preFiltered.count() >= filtered.length)
  }

  test("physical plan uses TakeOrderedAndProject (no full sort, no shuffle)") {
    val plan = FlatKnn.search(emb, q0, 5).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
    assert(!plan.contains("Exchange rangepartitioning"))
  }
}
