package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import graft.functions.{Md5Chunks, Md5Prefix48, Md5PrefixInt}

/** Digest-byte md5 expressions must equal the hex-string composition
  * forms exactly — they feed every oracle-matched hash path. */
class Md5ExpressionsSpec extends SparkSpec {

  private val texts = Seq(
    "", "a", "hello world", "ünïcode 中文 🙂", "0|the quick brown fox",
    "x" * 1000, "tab\tnl\n")

  test("Md5PrefixInt equals conv(substring(md5(x),1,8),16,10)") {
    import spark.implicits._
    val df = texts.toDF("t")
    val rows = df.select(
      ColumnBridge.column(Md5PrefixInt(ColumnBridge.expression(col("t").cast("binary")))).as("fast"),
      conv(substring(md5(col("t").cast("binary")), 1, 8), 16, 10).cast("long").as("slow"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("Md5Prefix48 equals conv(substring(md5(x),1,12),16,10)") {
    import spark.implicits._
    val rows = texts.toDF("t").select(
      ColumnBridge.column(Md5Prefix48(ColumnBridge.expression(col("t")))).as("fast"),
      conv(substring(md5(col("t").cast("binary")), 1, 12), 16, 10)
        .cast("long").as("slow"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("Md5Chunks equals the four hex-chunk conv extractions") {
    import spark.implicits._
    val df = texts.toDF("t")
    val rows = df.select(
      ColumnBridge.column(Md5Chunks(ColumnBridge.expression(col("t").cast("binary")))).as("fast"),
      array((0 until 4).map(c =>
        conv(substring(md5(col("t").cast("binary")), 1 + 8 * c, 8), 16, 10).cast("long")): _*).as("slow"))
      .collect()
    rows.foreach { r =>
      assert(r.getAs[scala.collection.Seq[Long]]("fast") ===
        r.getAs[scala.collection.Seq[Long]]("slow"))
    }
  }

  test("Md5NoiseWalk equals the composed pmod(md5Int*(d+1)+d, mod) transform") {
    import spark.implicits._
    import graft.functions.Embedder
    val mod = 2001L
    val dim = 64
    val rows = texts.toDF("t")
      .select(col("t"), Embedder.md5Int(col("t")).as("__h"))
      .select(
        Embedder.noiseWalk(col("t"), dim, mod).as("fast"),
        transform(sequence(lit(0), lit(dim - 1)), d =>
          pmod(col("__h") * (d + lit(1)) + d, lit(mod))).as("slow"))
      .collect()
    rows.foreach { r =>
      assert(r.getAs[scala.collection.Seq[Long]]("fast") ===
        r.getAs[scala.collection.Seq[Long]]("slow"))
    }
  }

  test("Md5NoiseWalk interpreted eval matches codegen output") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import graft.functions.Md5NoiseWalk
    val interp = Md5NoiseWalk(Literal("probe".getBytes("UTF-8")), 8, 2001L)
      .eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray()
    import spark.implicits._
    val viaDf = Seq("probe").toDF("t")
      .select(graft.functions.Embedder.noiseWalk(col("t"), 8, 2001L))
      .head().getAs[scala.collection.Seq[Long]](0)
    assert(interp.toSeq === viaDf.toSeq)
  }

  test("interpreted eval matches codegen output") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val interp = Md5PrefixInt(Literal("probe")).eval(null)
    import spark.implicits._
    val viaDf = Seq("probe").toDF("t")
      .select(ColumnBridge.column(Md5PrefixInt(ColumnBridge.expression(col("t")))))
      .head().getLong(0)
    assert(interp === viaDf)
  }
}
