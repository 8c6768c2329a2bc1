package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.functions.VectorFunctions.{Euclidean, Metric}

/** The reference's pluggable `Indexer` ABC
  * (`/root/reference/app/core/indexers/indexer.py:41-87`) re-expressed
  * for Spark: every index answers `search(query, k, metric)` with a
  * `(id, dist)` DataFrame, deterministically tie-broken on (dist, id).
  */
trait VectorIndex {
  def search(query: Seq[Float], k: Int, metric: Metric = Euclidean): DataFrame
}

/** Exact brute force over the full corpus (flat_index.py). */
class FlatVectorIndex(
    df: DataFrame,
    idCol: String = "vec_id",
    embCol: String = "embedding")
    extends VectorIndex {
  def search(query: Seq[Float], k: Int, metric: Metric): DataFrame =
    FlatKnn.search(df, query, k, metric, idCol, embCol)
}

/** Sign-LSH bucket probe + exact re-rank (lsh.py), over a prebuilt
  * signature table. */
class LshVectorIndex(
    df: DataFrame,
    sigTable: DataFrame,
    params: LshIndex.Params = LshIndex.Params(),
    idCol: String = "vec_id",
    embCol: String = "embedding")
    extends VectorIndex {
  def search(query: Seq[Float], k: Int, metric: Metric): DataFrame =
    LshIndex.searchWithTable(df, sigTable, query, k, params, metric, idCol, embCol)
}

/** Driver-local HNSW graph (hnsw.py). The metric argument is ignored for
  * RANKING — HNSW ranks euclidean-over-normalized (≡ cosine ordering,
  * hnsw.py:116,300), the same quirk the reference has. */
class HnswVectorIndex(
    spark: SparkSession,
    index: HnswIndex,
    idCol: String = "vec_id")
    extends VectorIndex {
  def search(query: Seq[Float], k: Int, metric: Metric): DataFrame = {
    import spark.implicits._
    index
      .search(query.toArray, k)
      .toDF(idCol, "dist")
  }
}
