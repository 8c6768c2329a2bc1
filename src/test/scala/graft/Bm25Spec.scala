package graft

import org.apache.spark.sql.functions._

import graft.functions.Bm25

/** Bm25.score pinned against an independent inverted-index formulation
  * (explode → per-(doc, term) tf → df join), plus the plan property the
  * scan-side shape exists for: no join shuffle — the only exchanges are
  * the one bounded stats aggregate and its broadcast back. */
class Bm25Spec extends SparkSpec {

  import spark.implicits._

  private val terms = Seq("hash", "join", "window", "spark")
  private val k1 = 1.2
  private val b = 0.75

  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")
    .select("doc_id", "text")

  test("matches the inverted-index formulation") {
    val fast = Bm25.score(docs, "text", terms)
      .select(col("doc_id"), col("bm25"))
      .as[(Long, Double)].collect().toMap

    // independent path: explode tokens, aggregate tf per (doc, term),
    // join df + corpus stats, sum per-term scores
    val toks = docs.select(col("doc_id"),
      size(split(lower(col("text")), " ", -1)).as("dl"),
      explode(split(lower(col("text")), " ", -1)).as("tok"))
    val tf = toks.where(col("tok").isin(terms: _*))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val st = docs.select(size(split(lower(col("text")), " ", -1)).as("dl"))
      .agg(count(lit(1)).as("n"), avg(col("dl")).as("avgdl")).head()
    val (n, avgdl) = (st.getLong(0), st.getDouble(1))
    val expected = docs.select(col("doc_id"),
      size(split(lower(col("text")), " ", -1)).as("dl"))
      .join(tf, Seq("doc_id"), "left")
      .join(df, Seq("tok"), "left")
      .withColumn("s",
        coalesce(
          log(lit(1.0) + (lit(n.toDouble) - col("df") + 0.5) / (col("df") + 0.5)) *
            (col("tf").cast("double") * (k1 + 1.0)) /
            (col("tf").cast("double") +
              lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / lit(avgdl))),
          lit(0.0)))
      .groupBy("doc_id").agg(sum("s").as("bm25"))
      .as[(Long, Double)].collect().toMap

    assert(fast.keySet === expected.keySet)
    fast.foreach { case (id, s) =>
      assert(math.abs(s - expected(id)) < 1e-9, s"doc $id: $s vs ${expected(id)}")
    }
    // sanity: scores discriminate (not all equal) and are non-negative
    assert(fast.values.toSet.size > 1)
    assert(fast.values.forall(_ >= 0.0))
  }

  test("fused TermCounts kernel == composed size∘filter∘split form") {
    val fused = Bm25.withTermCountsFused(docs, "text", terms)
      .select("doc_id", "__dl", "__tf0", "__tf1", "__tf2", "__tf3")
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    val composed = Bm25.withTermCountsComposed(docs, "text", terms)
      .select("doc_id", "__dl", "__tf0", "__tf1", "__tf2", "__tf3")
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(fused === composed)
    // empty string / consecutive-space semantics (string_split parity)
    import spark.implicits._
    val edge = Seq("", "hash  hash", " hash", "HASH Join").toDF("text")
    val f = Bm25.withTermCountsFused(edge, "text", Seq("hash", "join"))
      .select("__tf0", "__tf1", "__dl").as[(Long, Long, Long)].collect().toSeq
    val c = Bm25.withTermCountsComposed(edge, "text", Seq("hash", "join"))
      .select("__tf0", "__tf1", "__dl").as[(Long, Long, Long)].collect().toSeq
    assert(f === c)
    assert(f.head === ((0L, 0L, 1L))) // "" is one empty token
    assert(f(1) === ((2L, 0L, 3L)))   // double space → empty middle token
    assert(f(3) === ((1L, 1L, 2L)))   // case-insensitive
  }

  test("plan: scoring is a pure scan-side projection — no join, no exchange") {
    val plan = Bm25.score(docs, "text", terms)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    assert(!plan.contains("Exchange"), plan)
  }
}
