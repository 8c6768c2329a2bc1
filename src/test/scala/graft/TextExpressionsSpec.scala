package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

import graft.functions.{GramHashes, TextAnalysis, Winnow}

/** The fused fingerprint kernels must be bit-identical to the column
  * compositions they replace (which are themselves oracle-checked by
  * q_fingerprint's DuckDB twin). */
class TextExpressionsSpec extends SparkSpec {

  private def gramsExpr(c: org.apache.spark.sql.Column, k: Int) =
    ColumnBridge.column(GramHashes(ColumnBridge.expression(c), k))
  private def winnowExpr(c: org.apache.spark.sql.Column, w: Int) =
    ColumnBridge.column(Winnow(ColumnBridge.expression(c), w))

  test("GramHashes == charCodes∘gramHashesFromCodes on the real corpus") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(100)
    val both = docs
      .select(col("doc_id"), col("text"),
        TextAnalysis.charCodes(col("text")).as("__codes"))
      .select(col("doc_id"),
        TextAnalysis.gramHashesFromCodes(col("__codes"), 8).as("cols"),
        gramsExpr(col("text"), 8).as("fused"))
    assert(both.where(col("cols") =!= col("fused")).isEmpty)
  }

  test("GramHashes edge cases: empty, shorter than k, exactly k, BMP unicode") {
    import spark.implicits._
    val df = Seq("", "abc", "abcdefgh",
      "héllo wörld ünïcode tested here",
      "你好世界测试一二三四五六七八").toDF("text")
    val out = df
      .select(col("text"), TextAnalysis.charCodes(col("text")).as("__codes"))
      .select(
        TextAnalysis.gramHashesFromCodes(col("__codes"), 8).as("cols"),
        gramsExpr(col("text"), 8).as("fused"))
      .collect()
    out.foreach { r =>
      assert(r.getAs[scala.collection.Seq[Long]]("cols") ===
        r.getAs[scala.collection.Seq[Long]]("fused"))
    }
  }

  test("Winnow == column winnow on the real corpus, incl. order") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(100)
    val both = docs
      .select(gramsExpr(col("text"), 8).as("g"))
      .select(
        TextAnalysis.winnow(col("g"), 4).as("cols"),
        winnowExpr(col("g"), 4).as("fused"))
    assert(both.where(col("cols") =!= col("fused")).isEmpty)
  }

  private def tokenStatsExpr(c: org.apache.spark.sql.Column) =
    ColumnBridge.column(graft.functions.TokenStats(ColumnBridge.expression(c)))

  /** The column composition TokenStats replaces (q_filter_reasons'
    * original formulation, itself oracle-checked against DuckDB). */
  private def tokenStatsCols(c: org.apache.spark.sql.Column) = {
    val tk = split(c, " ", -1)
    val g2 = when(size(tk) < 2, array(c))
      .otherwise(transform(
        sequence(lit(1), size(tk) - 1),
        i => concat(element_at(tk, i), lit(" "), element_at(tk, i + 1))))
    array(
      size(tk).cast("long"),
      size(array_distinct(tk)).cast("long"),
      size(g2).cast("long"),
      size(array_distinct(g2)).cast("long"))
  }

  test("TokenStats == split/transform/array_distinct on the real corpus") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(200)
    val both = docs.select(
      tokenStatsCols(col("text")).as("cols"),
      tokenStatsExpr(col("text")).as("fused"))
    assert(both.where(col("cols") =!= col("fused")).isEmpty)
  }

  test("TokenStats edge cases: empty, one token, doubled/leading/trailing spaces, unicode") {
    import spark.implicits._
    val df = Seq("", "one", "a b", "a  b", " lead", "trail ", "a b a b a",
      "héllo wörld héllo wörld", "你好 世界 你好 世界", "  ", "a").toDF("text")
    val out = df.select(
      tokenStatsCols(col("text")).as("cols"),
      tokenStatsExpr(col("text")).as("fused"))
      .collect()
    out.foreach { r =>
      assert(r.getAs[scala.collection.Seq[Long]]("cols") ===
        r.getAs[scala.collection.Seq[Long]]("fused"))
    }
  }

  test("fused kernels compile under CODEGEN_ONLY") {
    val saved = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val out = spark.read.parquet(s"$sfDir/documents.parquet").limit(5)
        .select(winnowExpr(gramsExpr(col("text"), 8), 4).as("fp"),
          tokenStatsExpr(col("text")).as("ts"))
        .collect()
      assert(out.forall(_.getAs[scala.collection.Seq[Long]]("fp").nonEmpty))
      assert(out.forall(_.getAs[scala.collection.Seq[Long]]("ts").length == 4))
    } finally {
      saved match {
        case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
        case None    => spark.conf.unset("spark.sql.codegen.factoryMode")
      }
    }
  }
}
