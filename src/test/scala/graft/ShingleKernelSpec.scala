package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import graft.functions.DistinctShingles
import graft.operators.NearDup

/** Equivalence of the fused DistinctShingles kernel against the composed
  * split+transform+array_distinct form — shingle SETS equal on the real
  * corpus and adversarial token shapes, and the downstream consumers
  * (minhash signature, Jaccard) bitwise-identical across the two forms. */
class ShingleKernelSpec extends SparkSpec {

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")
  private val p = NearDup.Params()

  test("shingle sets equal the composed form on the real corpus") {
    val fused = NearDup.docShingles(docs, "doc_id", "text", p)
    val composed = NearDup.docShinglesComposed(docs, "doc_id", "text", p)
      .withColumnRenamed("shingles", "shingles_c")
    val mismatches = fused.join(composed, "doc_id")
      .where(
        size(array_except(col("shingles"), col("shingles_c"))) =!= 0 ||
        size(array_except(col("shingles_c"), col("shingles"))) =!= 0 ||
        size(col("shingles")) =!= size(array_distinct(col("shingles"))))
      .count()
    assert(mismatches === 0L)
  }

  test("adversarial token shapes: empty, short, repeated, multi-space, trailing") {
    import spark.implicits._
    val df = Seq(
      "", "a", "a b", "a b c", "a b c d", "a a a a a",
      "a  b  c  d", "a b c d ", " a b c d", "x y z x y z x y z")
      .toDF("text").withColumn("doc_id", monotonically_increasing_id())
    val fused = NearDup.docShingles(df, "doc_id", "text", p)
    val composed = NearDup.docShinglesComposed(df, "doc_id", "text", p)
      .withColumnRenamed("shingles", "shingles_c")
    val rows = fused.join(composed, "doc_id").collect()
    rows.foreach { r =>
      val f = r.getAs[scala.collection.Seq[String]]("shingles").toSet
      val c = r.getAs[scala.collection.Seq[String]]("shingles_c").toSet
      assert(f === c, s"shingle set mismatch for doc ${r.getAs[Long]("doc_id")}")
    }
  }

  test("minhash signatures and pair Jaccards bitwise-equal across the forms") {
    def sigsOf(sh: org.apache.spark.sql.DataFrame) = NearDup
      .withMinhashSignature(sh, "shingles", "sig", p.numHashes)
      .select(col("doc_id"), col("sig"))
    val viaFused = sigsOf(NearDup.docShingles(docs, "doc_id", "text", p))
    val viaComposed = sigsOf(NearDup.docShinglesComposed(docs, "doc_id", "text", p))
      .withColumnRenamed("sig", "sig_c")
    assert(viaFused.join(viaComposed, "doc_id")
      .where(col("sig") =!= col("sig_c")).count() === 0L)
  }

  test("kernel output is interpreted-eval consistent and inside codegen") {
    val expr = DistinctShingles(
      org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString("a b c d e")), 3)
    val interp = expr.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    assert(interp.numElements() === 3)
    val plan = docs
      .select(ColumnBridge.column(DistinctShingles(
        ColumnBridge.expression(col("text")), 3)).as("sh"))
      .queryExecution.executedPlan.toString
    // the `*(n)` prefix marks a WholeStageCodegen span in the compact form
    assert(plan.contains("*(1) Project [distinct_shingles"))
  }

  test("AllShingles equals the bound-token composition twin, incl. edges") {
    import spark.implicits._
    import org.apache.spark.sql.graft.ColumnBridge
    import graft.functions.AllShingles
    def fusedCol = ColumnBridge.column(
      AllShingles(ColumnBridge.expression(col("text")), 3))
    // composition: token array bound through a Generate barrier, then
    // the transform form the oracles mirror
    val edge = Seq("", "a", "a b", "a b c", "a b c d", "a  b c",
      " leading", "trailing ", "x  ", "a b c  d e").toDF("text")
    for (df <- Seq(edge, docs.select("text"))) {
      val bound = df
        .select(col("text"), explode(array(split(col("text"), " "))).as("tk"))
        .select(col("text"), SparkEntry.wordShingleCol(col("tk")).as("composed"))
        .select(col("text"), col("composed"), fusedCol.as("fused"))
      val bad = bound.where(not(col("composed") <=> col("fused"))).count()
      assert(bad === 0L)
    }
  }
}
