package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions
import graft.functions.VectorFunctions._

/** Bitwise equivalence of the fused codegen VectorDistance expression
  * against the built-in zip_with/aggregate composition — on real
  * embeddings AND adversarial vectors (zero vectors, duplicates), for
  * all four metrics, under both codegen and interpreted eval. */
class VectorDistanceSpec extends SparkSpec {

  private lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
  private lazy val q0: Seq[Float] =
    emb.where(col("vec_id") === 0).select("embedding").head().getSeq[Float](0)

  private def bitsOf(d: Double): Long = java.lang.Double.doubleToRawLongBits(d)

  for (m <- Metric.all) {
    test(s"native == builtin bitwise on real embeddings (${m.name})") {
      val rows = emb
        .select(
          VectorFunctions.distance(col("embedding"), typedLit(q0), m).as("native"),
          VectorFunctions.builtinDistance(col("embedding"), typedLit(q0), m).as("builtin"))
        .collect()
      assert(rows.length > 0)
      rows.foreach { r =>
        assert(bitsOf(r.getDouble(0)) === bitsOf(r.getDouble(1)),
          s"${m.name}: ${r.getDouble(0)} vs ${r.getDouble(1)}")
      }
    }
  }

  test("L2NormalizeFloat == composed when/transform normalize bitwise, incl. zero vectors") {
    import spark.implicits._
    val withZero = emb.select(col("embedding"))
      .unionAll(Seq(Seq.fill(4)(0f)).toDF("embedding"))
    val n = VectorFunctions.l2Norm(col("embedding"))
    val rows = withZero
      .select(
        VectorFunctions.l2NormalizeFloat(col("embedding")).as("fused"),
        when(n === 0.0, col("embedding"))
          .otherwise(transform(col("embedding"), x =>
            (x.cast("double") / n).cast("float")))
          .as("composed"))
      .collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      val f = r.getAs[scala.collection.Seq[Float]]("fused")
      val c = r.getAs[scala.collection.Seq[Float]]("composed")
      assert(f.length === c.length)
      f.zip(c).foreach { case (a, b) =>
        assert(java.lang.Float.floatToRawIntBits(a) ===
          java.lang.Float.floatToRawIntBits(b), s"$a vs $b")
      }
    }
  }

  test("L2NormalizeFloat null elements follow the composed twin: all-null array out") {
    // parquet float arrays usually carry containsNull=true; before the
    // round-15 advisor fix the fused kernel read null slots as 0.0f
    // while the composed form nulls the aggregate norm and therefore
    // every output element. Both forms must agree on the null case.
    import spark.implicits._
    val withNull = Seq(Seq[java.lang.Float](1f, null, 3f)).toDF("embedding")
    val n = VectorFunctions.l2Norm(col("embedding"))
    val r = withNull
      .select(
        VectorFunctions.l2NormalizeFloat(col("embedding")).as("fused"),
        when(n === 0.0, col("embedding"))
          .otherwise(transform(col("embedding"), x =>
            (x.cast("double") / n).cast("float")))
          .as("composed"))
      .head()
    val f = r.getAs[scala.collection.Seq[java.lang.Float]]("fused")
    val c = r.getAs[scala.collection.Seq[java.lang.Float]]("composed")
    assert(f.length === 3)
    assert(f.toSeq === c.toSeq)
    assert(f.forall(_ == null))
  }

  test("L2NormalizeFloat interpreted eval agrees with codegen") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    import graft.functions.L2NormalizeFloat
    val data = org.apache.spark.sql.catalyst.util.ArrayData
      .toArrayData(Array(3f, 4f, 0f))
    val interp = L2NormalizeFloat(Literal(data, ArrayType(FloatType, containsNull = false)))
      .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toFloatArray()
    import spark.implicits._
    val viaDf = Seq(Seq(3f, 4f, 0f)).toDF("e")
      .select(VectorFunctions.l2NormalizeFloat(col("e")))
      .head().getAs[scala.collection.Seq[Float]](0)
    assert(interp.toSeq === viaDf.toSeq)
    assert(math.abs(interp(0) - 0.6f) < 1e-7)
  }

  test("L2NormalizeCounts == composed normalize bitwise, incl. the all-zero counts row") {
    import spark.implicits._
    import graft.functions.Embedder
    val counts = Seq(
      Seq(1.0, 2.0, 0.0, 5.0), Seq(0.0, 0.0, 0.0, 0.0), Seq(3.0, 3.0, 3.0, 3.0))
      .toDF("counts")
    val rows = counts.select(
      Embedder.LexicalModel.normalizeCol(col("counts")).as("fused"),
      Embedder.LexicalModel.normalizeColComposed(col("counts")).as("composed"))
      .collect()
    rows.foreach { r =>
      val f = r.getAs[scala.collection.Seq[Float]]("fused")
      val c = r.getAs[scala.collection.Seq[Float]]("composed")
      assert(f.length === c.length)
      f.zip(c).foreach { case (a, b) =>
        assert(java.lang.Float.floatToRawIntBits(a) ===
          java.lang.Float.floatToRawIntBits(b), s"$a vs $b")
      }
    }
  }

  test("cosine_sim fused == composed bitwise, incl. zero-vector guard -> 0.0") {
    import spark.implicits._
    val rows = emb
      .select(
        VectorFunctions.cosineSimilarity(col("embedding"), typedLit(q0)).as("f"),
        VectorFunctions.cosineSimilarityComposed(col("embedding"), typedLit(q0)).as("c"))
      .collect()
    assert(rows.length > 0)
    rows.foreach(r =>
      assert(bitsOf(r.getDouble(0)) === bitsOf(r.getDouble(1)),
        s"${r.getDouble(0)} vs ${r.getDouble(1)}"))
    val zero = Seq.fill(8)(0.0f)
    val v = Seq(0.5f, -1f, 2f, 0f, 1f, 1f, -3f, 0.25f)
    val zdf = Seq((zero, v), (zero, zero), (v, zero)).toDF("a", "b")
    val zs = zdf.select(
      VectorFunctions.cosineSimilarity(col("a"), col("b")).as("f"),
      VectorFunctions.cosineSimilarityComposed(col("a"), col("b")).as("c")).collect()
    zs.foreach { r =>
      assert(r.getDouble(0) === 0.0)
      assert(bitsOf(r.getDouble(0)) === bitsOf(r.getDouble(1)))
    }
  }

  test("zero vectors: cosine guard yields exactly 1.0, others 0-consistent") {
    import spark.implicits._
    val zero = Seq.fill(8)(0.0f)
    val v = Seq(0.5f, -1f, 2f, 0f, 1f, 1f, -3f, 0.25f)
    val df = Seq((zero, v), (zero, zero), (v, v)).toDF("a", "b")
    Metric.all.foreach { m =>
      val rows = df.select(
        VectorFunctions.distance(col("a"), col("b"), m).as("n"),
        VectorFunctions.builtinDistance(col("a"), col("b"), m).as("o")).collect()
      rows.foreach(r => assert(bitsOf(r.getDouble(0)) === bitsOf(r.getDouble(1)), m.name))
    }
    val cos = df.select(VectorFunctions.distance(col("a"), col("b"), Cosine)).collect()
    assert(cos(0).getDouble(0) === 1.0 && cos(1).getDouble(0) === 1.0)
  }

  test("interpreted eval path agrees with codegen (eval via expression directly)") {
    import graft.functions.VectorDistance
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val a = Array(1.0f, 2.0f, -3.0f)
    val b = Array(0.5f, -1.5f, 4.0f)
    def litArr(v: Array[Float]) =
      Literal(ArrayData.toArrayData(v), ArrayType(FloatType))
    val interp = Metric.all.map(m =>
      VectorDistance(litArr(a), litArr(b), m.name).eval(null).asInstanceOf[Double])
    import spark.implicits._
    val viaSpark = Seq((a.toSeq, b.toSeq)).toDF("a", "b")
      .select(Metric.all.map(m =>
        VectorFunctions.distance(col("a"), col("b"), m).as(m.name)): _*)
      .head()
    Metric.all.zipWithIndex.foreach { case (m, i) =>
      assert(bitsOf(interp(i)) === bitsOf(viaSpark.getDouble(i)), m.name)
    }
  }

  test("mismatched lengths yield NULL like the built-in form") {
    import spark.implicits._
    val df = Seq((Seq(1.0f, 2.0f), Seq(1.0f, 2.0f, 3.0f))).toDF("a", "b")
    Seq(Euclidean, Manhattan, DotProduct).foreach { m =>
      val n = df.select(VectorFunctions.distance(col("a"), col("b"), m)).head()
      val o = df.select(VectorFunctions.builtinDistance(col("a"), col("b"), m)).head()
      assert(n.isNullAt(0) === o.isNullAt(0), m.name)
    }
  }

  test("kNN plan with the native expression stays inside WholeStageCodegen") {
    val plan = graft.operators.FlatKnn
      .search(emb, q0, 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("vector_distance_euclidean"))
  }
}
