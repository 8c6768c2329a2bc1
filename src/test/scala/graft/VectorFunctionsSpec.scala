package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions
import graft.functions.VectorFunctions._

/** Metric properties of the distance kernels (reference semantics:
  * indexer.py:89-130). One batch DataFrame of seeded random vector
  * triples is evaluated through the REAL Catalyst column builders; the
  * properties are asserted over the collected results — so these tests
  * exercise exactly the code the queries run, not a Scala mirror.
  */
class VectorFunctionsSpec extends SparkSpec {

  private val dim = 8
  private val nTriples = 200
  private val rnd = new scala.util.Random(42)

  private def randVec(): Seq[Float] =
    Seq.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat)

  private val zero = Seq.fill(dim)(0.0f)

  // seeded triples + adversarial cases: zero vectors, identical pairs
  private lazy val triples: Seq[(Seq[Float], Seq[Float], Seq[Float])] = {
    val base = Seq.fill(nTriples)((randVec(), randVec(), randVec()))
    val self = randVec()
    base ++ Seq(
      (zero, randVec(), randVec()),
      (randVec(), zero, randVec()),
      (zero, zero, zero),
      (self, self, randVec()))
  }

  private lazy val rows: Array[Row] = {
    import spark.implicits._
    val df = triples.toDF("a", "b", "c")
    df.select(
        euclidean(col("a"), col("b")).as("l2_ab"),
        euclidean(col("b"), col("a")).as("l2_ba"),
        euclidean(col("a"), col("c")).as("l2_ac"),
        euclidean(col("b"), col("c")).as("l2_bc"),
        euclidean(col("a"), col("a")).as("l2_aa"),
        manhattan(col("a"), col("b")).as("l1_ab"),
        manhattan(col("b"), col("a")).as("l1_ba"),
        manhattan(col("a"), col("c")).as("l1_ac"),
        manhattan(col("b"), col("c")).as("l1_bc"),
        manhattan(col("a"), col("a")).as("l1_aa"),
        cosineDistance(col("a"), col("b")).as("cos_ab"),
        cosineDistance(col("b"), col("a")).as("cos_ba"),
        negDotProduct(col("a"), col("b")).as("ndot_ab"),
        negDotProduct(col("b"), col("a")).as("ndot_ba"),
        VectorFunctions.l2Norm(col("a")).as("norm_a"),
        VectorFunctions.l2Norm(col("b")).as("norm_b"),
        col("a"),
        col("b"))
      .collect()
  }

  private val eps = 1e-9

  test("euclidean: identity d(a,a) == 0") {
    rows.foreach(r => assert(r.getAs[Double]("l2_aa") === 0.0))
  }

  test("manhattan: identity d(a,a) == 0") {
    rows.foreach(r => assert(r.getAs[Double]("l1_aa") === 0.0))
  }

  test("euclidean: symmetry d(a,b) == d(b,a)") {
    rows.foreach(r =>
      assert(math.abs(r.getAs[Double]("l2_ab") - r.getAs[Double]("l2_ba")) < eps))
  }

  test("manhattan: symmetry d(a,b) == d(b,a)") {
    rows.foreach(r =>
      assert(math.abs(r.getAs[Double]("l1_ab") - r.getAs[Double]("l1_ba")) < eps))
  }

  test("cosine: symmetry d(a,b) == d(b,a)") {
    rows.foreach(r =>
      assert(math.abs(r.getAs[Double]("cos_ab") - r.getAs[Double]("cos_ba")) < eps))
  }

  test("dot: symmetry -a·b == -b·a") {
    rows.foreach(r =>
      assert(math.abs(r.getAs[Double]("ndot_ab") - r.getAs[Double]("ndot_ba")) < eps))
  }

  test("euclidean: triangle inequality d(a,c) <= d(a,b) + d(b,c)") {
    rows.foreach(r =>
      assert(r.getAs[Double]("l2_ac") <=
        r.getAs[Double]("l2_ab") + r.getAs[Double]("l2_bc") + eps))
  }

  test("manhattan: triangle inequality d(a,c) <= d(a,b) + d(b,c)") {
    rows.foreach(r =>
      assert(r.getAs[Double]("l1_ac") <=
        r.getAs[Double]("l1_ab") + r.getAs[Double]("l1_bc") + eps))
  }

  test("cosine: range [0, 2] (within fp tolerance)") {
    rows.foreach { r =>
      val d = r.getAs[Double]("cos_ab")
      assert(d >= -1e-12 && d <= 2.0 + 1e-12, s"cosine distance $d out of range")
    }
  }

  test("cosine: zero-magnitude guard -> exactly 1.0 (indexer.py:117-119)") {
    rows.filter(r =>
      r.getAs[Double]("norm_a") == 0.0 || r.getAs[Double]("norm_b") == 0.0)
      .foreach(r => assert(r.getAs[Double]("cos_ab") === 1.0))
    // and the adversarial zero rows are actually present
    assert(rows.count(r => r.getAs[Double]("norm_a") == 0.0) >= 2)
  }

  test("euclidean/manhattan/dot agree with locally computed values") {
    rows.foreach { r =>
      val a = r.getAs[scala.collection.Seq[Float]]("a").map(_.toDouble)
      val b = r.getAs[scala.collection.Seq[Float]]("b").map(_.toDouble)
      val l2 = math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
      val l1 = a.zip(b).map { case (x, y) => math.abs(x - y) }.sum
      val nd = -a.zip(b).map { case (x, y) => x * y }.sum
      assert(math.abs(r.getAs[Double]("l2_ab") - l2) < 1e-9)
      assert(math.abs(r.getAs[Double]("l1_ab") - l1) < 1e-9)
      assert(math.abs(r.getAs[Double]("ndot_ab") - nd) < 1e-9)
    }
  }

  test("l2Norm agrees with locally computed norm") {
    rows.foreach { r =>
      val a = r.getAs[scala.collection.Seq[Float]]("a").map(_.toDouble)
      assert(math.abs(r.getAs[Double]("norm_a") - math.sqrt(a.map(x => x * x).sum)) < 1e-9)
    }
  }

  test("l2Normalize: non-zero vectors get norm 1, zero vectors pass through") {
    import spark.implicits._
    val df = Seq(randVec(), randVec(), zero).toDF("v")
    val out = df
      .select(
        VectorFunctions.l2Norm(col("v")).as("n0"),
        VectorFunctions.l2Norm(VectorFunctions.l2Normalize(col("v"))).as("n1"))
      .collect()
    out.foreach { r =>
      if (r.getAs[Double]("n0") == 0.0) assert(r.getAs[Double]("n1") === 0.0)
      else assert(math.abs(r.getAs[Double]("n1") - 1.0) < 1e-6)
    }
  }

  test("Metric.fromString round-trips all metrics and rejects unknowns") {
    Metric.all.foreach(m => assert(Metric.fromString(m.name) === m))
    assertThrows[IllegalArgumentException](Metric.fromString("chebyshev"))
  }
}
