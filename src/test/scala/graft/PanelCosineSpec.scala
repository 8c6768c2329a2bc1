package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import graft.functions.{PanelMaxCosine, VectorFunctions}

/** Bitwise equivalence of the fused PanelMaxCosine kernel against the
  * composed form it replaces (greatest over per-panel-vector
  * cosineSimilarity of float-centered arrays), on real embeddings and on
  * adversarial rows, under both codegen and interpreted eval paths. */
class PanelCosineSpec extends SparkSpec {

  private lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
  private lazy val panel: Seq[Seq[Float]] = emb
    .orderBy("vec_id").limit(7)
    .select("embedding").collect().toSeq.map(_.getSeq[Float](0))

  private def bitsOf(d: Double): Long = java.lang.Double.doubleToRawLongBits(d)

  private def composed(center: Float) = {
    val centered = transform(col("embedding"), x => x - lit(center))
    panel
      .map(ev => VectorFunctions.cosineSimilarityComposed(
        centered, typedLit(ev.map(_ - center))))
      .reduceLeft((a, b) => greatest(a, b))
  }

  private def fused(center: Float) = ColumnBridge.column(
    PanelMaxCosine(ColumnBridge.expression(col("embedding")), panel, center))

  test("fused == composed bitwise on real embeddings") {
    val rows = emb
      .select(fused(0.5f).as("f"), composed(0.5f).as("c"))
      .collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      assert(bitsOf(r.getDouble(0)) === bitsOf(r.getDouble(1)),
        s"${r.getDouble(0)} vs ${r.getDouble(1)}")
    }
  }

  test("fused == composed under interpreted eval (codegen fallback path)") {
    val key = "spark.sql.codegen.factoryMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "NO_CODEGEN")
    try {
      val rows = emb.limit(50)
        .select(fused(0.5f).as("f"), composed(0.5f).as("c"))
        .collect()
      rows.foreach { r =>
        assert(bitsOf(r.getDouble(0)) === bitsOf(r.getDouble(1)))
      }
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("zero centered norm hits the 0.0 guard, not NaN") {
    import spark.implicits._
    val dim = panel.head.length
    // a row that centers to the zero vector: every element == center
    val df = Seq(Tuple1(Seq.fill(dim)(0.5f))).toDF("embedding")
    val r = df.select(fused(0.5f).as("f"), composed(0.5f).as("c")).head()
    assert(r.getDouble(0) === 0.0)
    assert(r.getDouble(1) === 0.0)
  }

  test("dimension mismatch yields null") {
    import spark.implicits._
    val df = Seq(Tuple1(Seq(0.1f, 0.9f))).toDF("embedding")
    assert(df.select(fused(0.5f).as("f")).head().isNullAt(0))
  }

  test("construction rejects a zero-norm panel vector") {
    val bad = Seq(Seq.fill(4)(0.5f))
    val ex = intercept[IllegalArgumentException] {
      PanelMaxCosine(
        ColumnBridge.expression(lit(Array(0.1f, 0.2f, 0.3f, 0.4f))), bad, 0.5f)
    }
    assert(ex.getMessage.contains("zero centered norm"))
  }
}
