package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.ZOrder

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zValue16 column form equals the driver-local twin, incl. edges") {
    val samples = Seq(
      (0L, 0L), (1L, 0L), (0L, 1L), (65535L, 0L), (0L, 65535L),
      (65535L, 65535L), (12345L, 54321L), (32768L, 1L), (255L, 256L))
    val df = samples.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.zValue16(col("x"), col("y")).as("z"))
    df.collect().foreach { r =>
      assert(r.getLong(2) === ZOrder.zValue16Local(r.getLong(0), r.getLong(1)))
    }
    // known Morton codes: x fills even bits, y odd bits
    assert(ZOrder.zValue16Local(1, 0) === 1L)
    assert(ZOrder.zValue16Local(0, 1) === 2L)
    assert(ZOrder.zValue16Local(0xffffL, 0) === 0x55555555L)
    assert(ZOrder.zValue16Local(0, 0xffffL) === 0xaaaaaaaaL)
    assert(ZOrder.zValue16Local(0xffffL, 0xffffL) === 0xffffffffL)
  }

  test("scale16 is monotone, lands in [0, 65535], and STRETCHES narrow spans") {
    // wide span: compresses via right-shift
    val wide = Seq(0L, 1L << 40, (1L << 41) - 1)
    val wScaled = wide.map(v => ZOrder.scale16Local(v, 0, (1L << 41) - 1))
    assert(wScaled === wScaled.sorted)
    assert(wScaled.forall(v => v >= 0 && v <= 65535))
    // narrow span: stretches via left-shift so top-3 bits spread the grid
    val cells = (0L to 14L)
      .map(u => ZOrder.scale16Local(u, 0, 14) >> 13)
      .distinct
    assert(cells.size === 8, s"0..14 must fan out over all 8 top-3-bit cells, got $cells")
    // column form agrees
    val df = (0L to 14L).toDF("v")
      .select(ZOrder.scale16(col("v"), 0, 14).as("s"))
      .orderBy("s")
    assert(df.as[Long].collect().toSeq ===
      (0L to 14L).map(ZOrder.scale16Local(_, 0, 14)).sorted)
  }

  test("pruned zone-map read skips buckets and returns exactly the full-scan result") {
    val out = Files.createTempDirectory("zorder").toString
    // 2-D grid of points: x 0..999, y correlated so buckets are tight
    val df = spark.range(0, 4000).select(
      (col("id") % 1000).as("x"),
      ((col("id") % 1000) * 1000 + col("id")).as("y"),
      col("id").as("payload"))
    val (xLo, xHi) = (0L, 999L)
    val yb = df.agg(min("y"), max("y")).head()
    val (yLo, yHi) = (yb.getLong(0), yb.getLong(1))
    ZOrder.writeLayout(df, "x", "y", xLo, xHi, yLo, yHi, s"$out/layout")
    val layout = spark.read.parquet(s"$out/layout")
    val zones = ZOrder.zones(layout, "x", "y").collect().toSeq.map(r =>
      (r.getAs[Number]("zbucket").longValue(),
        r.getAs[Long]("x_min"), r.getAs[Long]("x_max"),
        r.getAs[Long]("y_min"), r.getAs[Long]("y_max")))
    val nBuckets = zones.size
    assert(nBuckets > 8, s"layout should spread over many buckets, got $nBuckets")

    val (qxLo, qxHi) = (100L, 260L)
    val (qyLo, qyHi) = (100000L, 270000L)
    val sel = ZOrder.overlappingBuckets(zones, qxLo, qxHi, qyLo, qyHi)
    assert(sel.nonEmpty && sel.size < nBuckets,
      s"zone consult must skip buckets: selected ${sel.size} of $nBuckets")

    val pruned = layout
      .where(col("zbucket").isin(sel: _*) &&
        col("x").between(qxLo, qxHi) && col("y").between(qyLo, qyHi))
    // partition pruning is visible in the plan, not just the zone math
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), s"no PartitionFilters in:\n$plan")
    val full = df
      .where(col("x").between(qxLo, qxHi) && col("y").between(qyLo, qyHi))
    val prunedRows = pruned.select("payload").as[Long].collect().sorted.toSeq
    val fullRows = full.select("payload").as[Long].collect().sorted.toSeq
    assert(prunedRows === fullRows)
    assert(prunedRows.nonEmpty)
    // and the selected buckets genuinely hold fewer files than the
    // layout (inputFiles ignores pruning, so count on the filesystem:
    // PartitionFilters above guarantees only these dirs are listed)
    val allFiles = layout.inputFiles.length
    val selFiles = sel.map { b =>
      new java.io.File(s"$out/layout/zbucket=$b")
        .listFiles().count(_.getName.endsWith(".parquet"))
    }.sum
    assert(selFiles < allFiles, s"$selFiles of $allFiles files")
  }

  test("wrong scaling bounds degrade pruning, never correctness (zones derive from data)") {
    val out = Files.createTempDirectory("zorderbad").toString
    val df = spark.range(0, 2000).select(
      (col("id") % 500).as("x"),
      (col("id") * 7 % 1000).as("y"),
      col("id").as("payload"))
    // bounds deliberately too narrow: values past hi wrap the 16-bit
    // domain, scattering buckets — but each bucket's zone rectangle
    // still comes from its actual rows, so the consult stays
    // conservative and the pruned read is exact
    ZOrder.writeLayout(df, "x", "y", 0, 40, 0, 60, s"$out/layout")
    val layout = spark.read.parquet(s"$out/layout")
    val zones = ZOrder.zones(layout, "x", "y").collect().toSeq.map(r =>
      (r.getAs[Number]("zbucket").longValue(),
        r.getAs[Long]("x_min"), r.getAs[Long]("x_max"),
        r.getAs[Long]("y_min"), r.getAs[Long]("y_max")))
    val sel = ZOrder.overlappingBuckets(zones, 100, 300, 200, 800)
    val pruned = layout
      .where(col("zbucket").isin(sel: _*) &&
        col("x").between(100, 300) && col("y").between(200, 800))
      .select("payload").as[Long].collect().sorted.toSeq
    val full = df
      .where(col("x").between(100, 300) && col("y").between(200, 800))
      .select("payload").as[Long].collect().sorted.toSeq
    assert(pruned === full)
    assert(pruned.nonEmpty)
  }
}
