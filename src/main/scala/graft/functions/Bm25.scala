package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 lexical relevance scoring — the classic probabilistic ranking
  * function (Robertson/Sparck Jones; the Lucene/Elasticsearch default)
  * as a pure Spark column composition.
  *
  * Scale shape: the naive IR formulation builds an inverted index
  * (explode every token → shuffle |corpus-tokens| rows). For a FIXED
  * query term set none of that is needed — per-document term
  * frequencies are `size(filter(tokens, = term))`, evaluated inside the
  * scan projection with zero shuffle, and the corpus statistics BM25
  * needs (N, avg doc length, per-term document frequencies) are ONE
  * bounded global aggregate (a single row) broadcast back over the
  * scoring scan. Two passes over the corpus, no explode, no join
  * shuffle, codegen end-to-end.
  *
  * Determinism (oracle parity): tf/df/N/dl are exact integers; avgdl is
  * one integer-over-integer double division; each term's score is a
  * fixed-order arithmetic expression over those, summed left-to-right —
  * no float aggregation whose order could drift between engines. The
  * idf is the standard `ln(1 + (N - df + 0.5)/(df + 0.5))` (always
  * positive, unlike the raw Robertson idf which goes negative for
  * df > N/2 — relevant here, where a 31-token vocabulary makes every
  * term common).
  */
object Bm25 {

  /** Tokens of `textCol`, lowercased, whitespace-split (parity with the
    * oracle's `string_split(lower(text), ' ')`). */
  def tokens(textCol: Column): Column = split(lower(textCol), " ", -1)

  private def tf(toks: Column, term: String): Column =
    size(filter(toks, x => x === lit(term)))

  /** Composed-builtin twin of the fused [[TermCounts]] kernel — the
    * form the DuckDB oracle mirrors; Bm25Spec pins both equal. */
  def withTermCountsComposed(docs: DataFrame, textCol: String, terms: Seq[String]): DataFrame = {
    val toks = tokens(col(textCol))
    docs
      .withColumn("__dl", size(toks).cast("long"))
      .withColumns(terms.zipWithIndex.map { case (term, i) =>
        s"__tf$i" -> tf(toks, term).cast("long")
      }.toMap)
  }

  /** One fused pass: ARRAY<LONG> [tf_0..tf_{K-1}, dl] per row, consumed
    * through its own projection boundary (a non-cheap expression used
    * K+1 times blocks CollapseProject) so the text is scanned once. */
  def withTermCountsFused(docs: DataFrame, textCol: String, terms: Seq[String]): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    val tc = ColumnBridge.column(
      TermCounts(ColumnBridge.expression(col(textCol)), terms))
    docs
      .withColumn("__tc", tc)
      .withColumns(terms.indices.map(i =>
        s"__tf$i" -> element_at(col("__tc"), i + 1)).toMap)
      .withColumn("__dl", element_at(col("__tc"), terms.size + 1))
      .drop("__tc")
  }

  /** Adds a `bm25` (double) column scoring `textCol` against `terms`.
    * All input columns pass through. */
  def score(
      docs: DataFrame,
      textCol: String,
      terms: Seq[String],
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "BM25 needs at least one query term")
    val withTf = withTermCountsFused(docs, textCol, terms)
    // one bounded aggregate: N, total length, and one df per term — a
    // single row, collected and inlined as literals (the vocab-score /
    // IVF-centroids pattern) so the scoring plan is a pure scan-side
    // projection with no join node at all
    val statCols =
      count(lit(1)).as("__n") +: sum(col("__dl")).as("__sl") +:
        terms.indices.map(i =>
          sum(when(col(s"__tf$i") > 0, 1L).otherwise(0L)).as(s"__df$i"))
    val stats = withTf.agg(statCols.head, statCols.tail: _*).head()
    val n = stats.getLong(0)
    val avgdl = stats.getLong(1).toDouble / n
    val termScore: Int => Column = { i =>
      val dfI = stats.getLong(2 + i)
      val tfD = col(s"__tf$i").cast("double")
      val idf = log(lit(1.0) +
        (lit(n) - lit(dfI) + lit(0.5)) / (lit(dfI) + lit(0.5)))
      idf * (tfD * (k1 + 1.0)) /
        (tfD + lit(k1) * (lit(1.0 - b) + lit(b) * col("__dl") / lit(avgdl)))
    }
    withTf
      .withColumn("bm25", terms.indices.map(termScore).reduce(_ + _))
      .drop("__dl" +: terms.indices.map(i => s"__tf$i"): _*)
  }

  /** Oracle twin: DuckDB SQL computing the same score over `documents`,
    * kept adjacent to the Scala so the two can't drift. Emits the
    * top-`k` (doc_id, bm25) rows. */
  def oracleSql(terms: Seq[String], k: Int, k1: Double = 1.2, b: Double = 0.75): String = {
    val tfs = terms.zipWithIndex.map { case (t, i) =>
      s"len(list_filter(tk, x -> x = '$t')) AS tf$i"
    }.mkString(",\n  ")
    val dfs = terms.indices.map(i =>
      s"sum(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS df$i").mkString(", ")
    val scores = terms.indices.map { i =>
      s"ln(1.0 + (n - df$i + 0.5)/(df$i + 0.5)) * (CAST(tf$i AS DOUBLE) * ${k1 + 1.0}) / " +
        s"(CAST(tf$i AS DOUBLE) + $k1 * (${1.0 - b} + $b * dl / avgdl))"
    }.mkString("(", " + ", ")")
    s"""WITH d AS (SELECT doc_id, string_split(lower(text), ' ') AS tk FROM documents),
       |f AS (SELECT doc_id, len(tk) AS dl,
       |  $tfs
       |  FROM d),
       |st AS (SELECT count(*) AS n, sum(dl) AS sl, $dfs FROM f),
       |sc AS (SELECT doc_id,
       |  (round($scores, 6) + 0.0) AS bm25
       |  FROM f, (SELECT *, sl/CAST(n AS DOUBLE) AS avgdl FROM st))
       |SELECT doc_id, bm25 FROM sc ORDER BY bm25 DESC, doc_id LIMIT $k""".stripMargin
  }
}
