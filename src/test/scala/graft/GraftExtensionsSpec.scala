package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.functions._

/** SQL registration of the custom expressions. */
class GraftExtensionsSpec extends SparkSpec {

  test("vector_distance is callable from SQL after register()") {
    GraftExtensions.register(spark)
    val row = spark
      .sql("""SELECT
             |  vector_distance(array(1.0F, 2.0F), array(1.0F, 2.0F), 'euclidean') AS zero,
             |  vector_distance(array(1.0F, 0.0F), array(0.0F, 1.0F), 'cosine') AS orth,
             |  vector_distance(array(1.0F, 2.0F), array(3.0F, 4.0F), 'dot_product') AS nd,
             |  vector_distance(array(1.0F, 2.0F), array(3.0F, 5.0F), 'manhattan') AS l1
             |""".stripMargin)
      .head()
    assert(row.getDouble(0) === 0.0)
    assert(math.abs(row.getDouble(1) - 1.0) < 1e-12)
    assert(row.getDouble(2) === -11.0)
    assert(row.getDouble(3) === 5.0)
  }

  test("graft_embed from SQL equals the driver-local embedder") {
    GraftExtensions.register(spark)
    val got = spark
      .sql("SELECT graft_embed('sql probe') AS e")
      .head()
      .getSeq[Float](0)
    assert(got.toArray.sameElements(graft.functions.Embedder.embedLocal("sql probe")))
  }

  test("vector_distance rejects a non-literal metric") {
    GraftExtensions.register(spark)
    assertThrows[Exception](
      spark.sql("SELECT vector_distance(array(1.0F), array(1.0F), concat('eu','clidean'))").head())
  }

  test("the SparkSessionExtensions route injects without error") {
    new GraftExtensions().apply(new SparkSessionExtensions)
  }

  test("registered kNN via pure SQL matches the programmatic FlatKnn path") {
    GraftExtensions.register(spark)
    spark.read.parquet(s"$sfDir/embeddings.parquet").createOrReplaceTempView("emb_sql")
    val viaSql = spark.sql(
      """SELECT vec_id FROM (
        |  SELECT vec_id, vector_distance(embedding,
        |    (SELECT embedding FROM emb_sql WHERE vec_id = 0), 'euclidean') AS dist
        |  FROM emb_sql) ORDER BY dist, vec_id LIMIT 5""".stripMargin)
      .collect().map(_.getLong(0))
    val q0 = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .where(col("vec_id") === 0).select("embedding").head().getSeq[Float](0)
    val viaApi = graft.operators.FlatKnn
      .search(spark.read.parquet(s"$sfDir/embeddings.parquet"), q0, 5)
      .collect().map(_.getAs[Long]("vec_id"))
    assert(viaSql.sameElements(viaApi))
  }

  test("text kernels are callable from SQL: term_counts, gram_hashes, winnow") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT term_counts('hash join hash', 'hash', 'join') AS tc,
        |       winnow(gram_hashes('hash join hash', 5), 4) AS fp""".stripMargin)
      .head()
    assert(r.getAs[scala.collection.Seq[Long]]("tc") === Seq(2L, 1L, 3L))
    assert(r.getAs[scala.collection.Seq[Long]]("fp").nonEmpty)
  }

  test("all_shingles is callable from SQL and matches the split composition") {
    GraftExtensions.register(spark)
    val rows = spark.sql(
      """SELECT all_shingles('a b c d', 3) AS f,
        |       all_shingles('a b', 3) AS empty""".stripMargin).head()
    assert(rows.getSeq[String](0) === Seq("a b c", "b c d"))
    assert(rows.getSeq[String](1) === Seq.empty[String])
  }
}
