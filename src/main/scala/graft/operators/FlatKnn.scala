package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions
import graft.functions.VectorFunctions.Metric

/** Exact (brute-force) k-nearest-neighbor search — the Spark-native
  * equivalent of the reference's `FlatIndexer.search`
  * (`/root/reference/app/core/indexers/flat_index.py:69-110`).
  *
  * Design (SURVEY.md §2.4 K1): the query vector is a broadcast literal;
  * distance is a codegen'd column expression; `orderBy(dist, id).limit(k)`
  * lets Catalyst plan a shuffle-free `TakeOrderedAndProject` — each
  * partition keeps a k-element heap and only k rows per partition reach the
  * driver, so the plan scales linearly over 1000 executors with no full
  * sort and no shuffle. Column pruning pushes only (id, embedding) into the
  * parquet scan.
  *
  * Distances are ordered `asc_nulls_last`: `VectorDistance` yields NULL for
  * a dimension-mismatched embedding, and Spark's default ascending sort is
  * NULLS FIRST — without the explicit null ordering a single wrong-dim row
  * would rank at the top of every result. Ingest-side dimension validation
  * (`LibraryCatalog.normalizeShape`) is the first line of defense; this is
  * the belt-and-suspenders second.
  */
object FlatKnn {

  /** Top-k rows of `df` nearest to `query` under `metric`.
    * Output: idCol, dist (exact double) — deterministically tie-broken
    * by id ascending (FIXTURES.md §C).
    */
  def search(
      df: DataFrame,
      query: Seq[Float],
      k: Int,
      metric: Metric = VectorFunctions.Euclidean,
      idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame = {
    val q = typedLit(query)
    df.select(
        col(idCol),
        VectorFunctions.distance(col(embCol), q, metric).as("dist"))
      .orderBy(col("dist").asc_nulls_last, col(idCol).asc)
      .limit(k)
  }

  /** Like `search` but keeps extra payload columns on the result. */
  def searchWithColumns(
      df: DataFrame,
      query: Seq[Float],
      k: Int,
      metric: Metric,
      idCol: String,
      embCol: String,
      extra: Seq[String]): DataFrame = {
    val q = typedLit(query)
    df.select(
        (col(idCol) +: extra.map(col)) :+
          VectorFunctions.distance(col(embCol), q, metric).as("dist"): _*)
      .orderBy(col("dist").asc_nulls_last, col(idCol).asc)
      .limit(k)
  }

  /** Reference quirk K5 (`library_service.py:217-223`): ranking always uses
    * the index's default metric (euclidean) but the response `score` is
    * recomputed in the *requested* metric. `rankMetric` orders + truncates;
    * `scoreMetric` is projected as `score`.
    */
  def searchWithScore(
      df: DataFrame,
      query: Seq[Float],
      k: Int,
      rankMetric: Metric,
      scoreMetric: Metric,
      idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame = {
    val q = typedLit(query)
    df.select(
        col(idCol),
        VectorFunctions.distance(col(embCol), q, rankMetric).as("dist"),
        VectorFunctions.distance(col(embCol), q, scoreMetric).as("score"))
      .orderBy(col("dist").asc_nulls_last, col(idCol).asc)
      .limit(k)
  }
}
