package graft

import org.apache.spark.sql.functions._
import graft.operators.{FlatKnn, IvfIndex}

/** IVF invariants on real sf0.001 embeddings. */
class IvfIndexSpec extends SparkSpec {

  private val p = IvfIndex.Params()
  private lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").cache()
  private lazy val q0: Seq[Float] =
    emb.where(col("vec_id") === 0).select("embedding").head().getSeq[Float](0)

  test("centroid ids are dense 0..nCells-1 (oracle assumption)") {
    val ids = emb.select("vec_id").orderBy("vec_id").limit(p.nCells)
      .collect().map(_.getLong(0))
    assert(ids.sameElements(0L until p.nCells.toLong))
  }

  test("every vector is assigned to exactly one valid cell") {
    val cents = IvfIndex.centroids(emb, p)
    val cells = IvfIndex.cellAssignments(emb, cents).cache()
    assert(cells.count() === emb.count())
    val mm = cells.agg(min("cell"), max("cell")).head()
    assert(mm.getLong(0) >= 0L && mm.getLong(1) < p.nCells.toLong)
    cells.unpersist()
  }

  test("a centroid vector is assigned to its own cell") {
    val cents = IvfIndex.centroids(emb, p)
    val own = IvfIndex
      .cellAssignments(emb.where(col("vec_id") < p.nCells), cents)
      .collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("cell"))
    own.foreach { case (id, cell) => assert(cell === id, s"centroid $id in cell $cell") }
  }

  test("self-query ranks the stored vector first at distance 0") {
    val top = IvfIndex.search(emb, q0, 10, p).head()
    assert(top.getAs[Long]("vec_id") === 0L)
    assert(math.abs(top.getAs[Double]("dist")) < 1e-9)
  }

  test("returns k rows sorted by (dist, id); recall vs exact is sane") {
    val rows = IvfIndex.search(emb, q0, 10, p).collect()
    assert(rows.length === 10)
    val pairs = rows.map(r => (r.getAs[Double]("dist"), r.getAs[Long]("vec_id")))
    assert(pairs.sameElements(pairs.sortBy(identity)))
    val exact = FlatKnn.search(emb, q0, 10).collect().map(_.getAs[Long]("vec_id")).toSet
    val recall = exact.intersect(rows.map(_.getAs[Long]("vec_id")).toSet).size / 10.0
    assert(recall >= 0.3, s"recall@10 = $recall")
  }

  test("under-k fallback returns exact results when probed cells are too small") {
    // nProbe=1 over a tiny corpus: probed cell holds < k vectors
    val tiny = emb.where(col("vec_id") < 20).cache()
    val sparse = IvfIndex.Params(nCells = 16, nProbe = 1)
    val got = IvfIndex.search(tiny, q0, 15, sparse).collect().map(_.getAs[Long]("vec_id"))
    val exact = FlatKnn.search(tiny, q0, 15).collect().map(_.getAs[Long]("vec_id"))
    assert(got.sameElements(exact))
    tiny.unpersist()
  }
}
