package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import graft.functions.{LexicalBuckets, LshSignature, Md5Chunks, Md5Embed, Md5Prefix48, Md5PrefixInt, MinhashSigs, SimhashFromTokens, VectorDistance}

/** Every custom codegen expression must actually COMPILE. Round 3's md5
  * doGenCode failed Janino compilation and silently ran interpreted —
  * correctness held, the perf win didn't, and only the bench log showed
  * it. These tests disable every codegen fallback so a Janino failure
  * fails `sbt test` instead of hiding.
  */
class CodegenOnlySpec extends SparkSpec {

  private val guardedConfs = Seq(
    "spark.sql.codegen.factoryMode" -> "CODEGEN_ONLY",
    "spark.sql.codegen.fallback"    -> "false",
    "spark.sql.codegen.wholeStage"  -> "true")

  private def withCodegenOnly[T](body: => T): T = {
    val prev = guardedConfs.map { case (k, _) => k -> spark.conf.getOption(k) }
    guardedConfs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  private val texts =
    Seq("", "a", "hello world", "ünïcode 中文 🙂", "0|the quick brown fox", "x" * 1000)

  test("Md5PrefixInt compiles under CODEGEN_ONLY and matches the hex composition") {
    import spark.implicits._
    withCodegenOnly {
      val rows = texts.toDF("t").select(
        ColumnBridge.column(Md5PrefixInt(ColumnBridge.expression(col("t").cast("binary")))).as("fast"),
        conv(substring(md5(col("t").cast("binary")), 1, 8), 16, 10).cast("long").as("slow"))
        .collect()
      assert(rows.nonEmpty)
      rows.foreach(r => assert(r.getLong(0) === r.getLong(1)))
    }
  }

  test("Md5Prefix48 compiles under CODEGEN_ONLY and matches the 12-hex-char parse") {
    import spark.implicits._
    withCodegenOnly {
      val rows = texts.toDF("t").select(
        ColumnBridge.column(Md5Prefix48(ColumnBridge.expression(col("t")))).as("fast"),
        conv(substring(md5(col("t").cast("binary")), 1, 12), 16, 10).cast("long").as("slow"))
        .collect()
      rows.foreach(r => assert(r.getLong(0) === r.getLong(1)))
    }
  }

  test("Md5Chunks compiles under CODEGEN_ONLY and matches the four hex chunks") {
    import spark.implicits._
    withCodegenOnly {
      val rows = texts.toDF("t").select(
        ColumnBridge.column(Md5Chunks(ColumnBridge.expression(col("t").cast("binary")))).as("fast"),
        array((0 until 4).map(c =>
          conv(substring(md5(col("t").cast("binary")), 1 + 8 * c, 8), 16, 10).cast("long")): _*).as("slow"))
        .collect()
      rows.foreach { r =>
        assert(r.getAs[scala.collection.Seq[Long]]("fast") ===
          r.getAs[scala.collection.Seq[Long]]("slow"))
      }
    }
  }

  test("Md5Embed compiles under CODEGEN_ONLY and matches the transform composition") {
    import spark.implicits._
    withCodegenOnly {
      val rows = texts.toDF("t").select(
        ColumnBridge.column(
          Md5Embed(ColumnBridge.expression(col("t").cast("binary")), 32)).as("fast"),
        graft.functions.Embedder.embedFromHash(
          conv(substring(md5(col("t").cast("binary")), 1, 8), 16, 10).cast("long"), 32).as("slow"))
        .collect()
      rows.foreach { r =>
        val fast = r.getAs[scala.collection.Seq[Float]]("fast")
        val slow = r.getAs[scala.collection.Seq[Float]]("slow")
        assert(fast.map(java.lang.Float.floatToIntBits) ===
          slow.map(java.lang.Float.floatToIntBits))
      }
      // and it matches the driver-local form bit-for-bit
      texts.foreach { t =>
        val local = graft.functions.Embedder.embedLocal(t, 32)
        val cat = texts.toDF("t").where(col("t") === t).select(
          ColumnBridge.column(
            Md5Embed(ColumnBridge.expression(col("t").cast("binary")), 32)))
          .head().getAs[scala.collection.Seq[Float]](0)
        assert(cat.map(java.lang.Float.floatToIntBits).toSeq ===
          local.map(java.lang.Float.floatToIntBits).toSeq)
      }
    }
  }

  test("MinhashSigs compiles under CODEGEN_ONLY and matches interpreted eval") {
    import spark.implicits._
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    val shingleSets = Seq(
      Seq("a b c", "b c d", "c d e"),
      Seq("single"),
      Seq("ünïcode 中文", "🙂 emoji"))
    withCodegenOnly {
      val rows = shingleSets.toDF("sh")
        .select(ColumnBridge.column(
          MinhashSigs(ColumnBridge.expression(col("sh")), 12)).as("sig"))
        .collect()
      val expected = shingleSets.map { s =>
        MinhashSigs(Literal.create(
          ArrayData.toArrayData(s.map(org.apache.spark.unsafe.types.UTF8String.fromString)),
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType, false)), 12)
          .eval(null).asInstanceOf[ArrayData].toLongArray().toSeq
      }
      assert(rows.map(_.getAs[scala.collection.Seq[Long]]("sig").toSeq).toSeq === expected)
    }
  }

  test("SimhashFromTokens compiles under CODEGEN_ONLY and matches interpreted eval") {
    import spark.implicits._
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    val tokenSets = Seq(
      Seq("a", "b", "c", "a"),
      Seq("lone"),
      Seq("ünïcode", "中文", "🙂"))
    withCodegenOnly {
      val rows = tokenSets.toDF("tk")
        .select(ColumnBridge.column(
          SimhashFromTokens(ColumnBridge.expression(col("tk")), 32)).as("fp"))
        .collect()
      val expected = tokenSets.map { s =>
        SimhashFromTokens(Literal.create(
          ArrayData.toArrayData(s.map(org.apache.spark.unsafe.types.UTF8String.fromString)),
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType, false)), 32)
          .eval(null).asInstanceOf[Long]
      }
      assert(rows.map(_.getLong(0)).toSeq === expected)
    }
  }

  test("LexicalBuckets compiles under CODEGEN_ONLY and matches interpreted eval") {
    import spark.implicits._
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    withCodegenOnly {
      val rows = texts.toDF("t")
        .select(ColumnBridge.column(
          LexicalBuckets(ColumnBridge.expression(col("t")), 32)).as("c"))
        .collect()
      val expected = texts.map { t =>
        LexicalBuckets(Literal.create(
          org.apache.spark.unsafe.types.UTF8String.fromString(t),
          org.apache.spark.sql.types.StringType), 32)
          .eval(null).asInstanceOf[ArrayData].toDoubleArray().toSeq
      }
      assert(rows.map(_.getAs[scala.collection.Seq[Double]]("c").toSeq).toSeq === expected)
    }
  }

  test("VectorDistance compiles under CODEGEN_ONLY for all four metrics") {
    import spark.implicits._
    withCodegenOnly {
      val df = Seq(
        (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
        (Array(0.0f, 0.0f, 0.0f), Array(1.0f, 1.0f, 1.0f)),
        (Array(-1.5f, 2.5f, 0.25f), Array(0.5f, -0.5f, 8.0f))).toDF("a", "b")
      import graft.functions.VectorFunctions
      for (m <- Seq(VectorFunctions.Euclidean, VectorFunctions.Cosine,
          VectorFunctions.DotProduct, VectorFunctions.Manhattan)) {
        val fused = ColumnBridge.column(
          VectorDistance(ColumnBridge.expression(col("a")),
            ColumnBridge.expression(col("b")), m.name))
        val rows = df.select(fused.as("fast"),
          VectorFunctions.builtinDistance(col("a"), col("b"), m).as("slow"))
          .collect()
        rows.foreach { r =>
          assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
            java.lang.Double.doubleToLongBits(r.getDouble(1)), s"metric=${m.name}")
        }
      }
    }
  }

  test("LshSignature compiles under CODEGEN_ONLY and matches interpreted eval") {
    import spark.implicits._
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    val planes = Array(
      Array(0.3, -0.7, 0.2), Array(-0.1, 0.9, -0.4),
      Array(0.5, 0.5, 0.5), Array(-0.6, 0.1, 0.8))
    val vecs = Seq(Array(1.0f, 2.0f, 3.0f), Array(-1.0f, 0.0f, 0.5f))
    withCodegenOnly {
      val rows = vecs.toDF("v")
        .select(ColumnBridge.column(
          LshSignature(ColumnBridge.expression(col("v")), planes)).as("sig"))
        .collect()
      val expected = vecs.map { v =>
        LshSignature(Literal.create(ArrayData.toArrayData(v),
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType, false)),
          planes).eval(null).asInstanceOf[Long]
      }
      assert(rows.map(_.getLong(0)).toSeq === expected)
    }
  }

  test("TermCounts compiles under CODEGEN_ONLY and matches the composed form") {
    import spark.implicits._
    withCodegenOnly {
      val terms = Seq("hello", "the")
      val rows = texts.toDF("t").select(
        ColumnBridge.column(graft.functions.TermCounts(
          ColumnBridge.expression(col("t")), terms)).as("fast"),
        array(
          size(filter(split(lower(col("t")), " ", -1), x => x === lit("hello"))).cast("long"),
          size(filter(split(lower(col("t")), " ", -1), x => x === lit("the"))).cast("long"),
          size(split(lower(col("t")), " ", -1)).cast("long")).as("slow"))
        .collect()
      rows.foreach { r =>
        assert(r.getAs[scala.collection.Seq[Long]]("fast") ===
          r.getAs[scala.collection.Seq[Long]]("slow"))
      }
    }
  }

  test("KMeansAssign compiles under CODEGEN_ONLY and matches the composition") {
    import graft.operators.KMeans
    withCodegenOnly {
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
        .select(col("vec_id"), KMeans.quantize(col("embedding")).as("x"))
      val cs = emb.where(col("vec_id") < 4).orderBy("vec_id").collect()
        .map(_.getAs[scala.collection.Seq[Long]]("x").toIndexedSeq)
        .toIndexedSeq
      val fast = KMeans.assign(emb, "x", cs)
        .select("vec_id", "cid", "dist").orderBy("vec_id").collect().toSeq
      val slow = KMeans.assignComposed(emb, "x", cs)
        .select("vec_id", "cid", "dist").orderBy("vec_id").collect().toSeq
      assert(fast.nonEmpty)
      assert(fast == slow)
    }
  }

  test("AllShingles compiles under CODEGEN_ONLY and matches the bound composition") {
    import spark.implicits._
    withCodegenOnly {
      val shingleTexts = Seq("", "a", "a b", "a b c", "a b c d e",
        "a  b c", "the quick brown fox jumps")
      val rows = shingleTexts.toDF("t").select(
        ColumnBridge.column(graft.functions.AllShingles(
          ColumnBridge.expression(col("t")), 3)).as("fast"),
        // bound-token composition (tk materialized through explode(array))
        col("t"))
        .select(col("fast"), explode(array(split(col("t"), " "))).as("tk"))
        .select(col("fast"),
          when(size(col("tk")) >= 3,
            transform(sequence(lit(1), size(col("tk")) - 2), i =>
              concat(element_at(col("tk"), i), lit(" "),
                element_at(col("tk"), i + 1), lit(" "),
                element_at(col("tk"), i + 2))))
            .otherwise(array().cast("array<string>")).as("slow"))
        .collect()
      rows.foreach(r => assert(r.getSeq[String](0) === r.getSeq[String](1)))
    }
  }
}
