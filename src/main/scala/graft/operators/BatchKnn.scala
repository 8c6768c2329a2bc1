package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.{Cosine, DotProduct, Euclidean, Manhattan, Metric}

/** Batched exact kNN: top-k nearest corpus rows for EACH of Q query
  * vectors in ONE pass over the corpus.
  *
  * The reference serves one query per request (`flat_index.py:69-110`);
  * at pipeline scale (dedup sweeps, eval-set scoring, retrieval
  * backfills) the natural unit is a query BATCH, and running Q
  * single-query jobs scans the corpus Q times. The other declarative
  * option — `corpus CROSS JOIN queries` + a per-query window rank —
  * shuffles N×Q rows because Catalyst cannot know the cross product is
  * partition-local. So this is one of the rare operators where
  * `mapPartitions` is the right Spark shape (SURVEY.md §preference (d)):
  *
  *  - Phase 1: each input partition keeps a bounded k-heap PER QUERY;
  *    every corpus row dies inside its partition. Only
  *    partitions × Q × k candidate rows (id + dist, no embeddings) are
  *    emitted.
  *  - Phase 2: per-query global top-k over that tiny candidate set via
  *    a window rank — the only shuffle, P×Q×k rows.
  *
  * At 100 TB / 1000 executors: phase 1 is embarrassingly parallel and
  * reads each corpus byte once for the whole batch; phase 2 shuffles
  * kilobytes. Distances use the same double-accumulation kernels as
  * [[graft.functions.VectorDistance]] — including the cosine
  * guard-before-length quirk, so a zero-norm row's distance is defined
  * even across mismatched dims exactly like the kernel — and results
  * are bit-identical to the single-query operators (and the SQL
  * oracle) on every row whose distance is DEFINED. The one deliberate
  * divergence: rows with UNDEFINED (NULL) distance never appear here,
  * while FlatKnn's nulls-last ordering pads an under-filled result
  * with them — "nearest neighbors at unknown distance" is noise, and
  * a batch operator emitting P×Q×k candidate rows should not carry it.
  */
object BatchKnn {

  /** Local twin of VectorDistance.nullSafeEval — same accumulation
    * order, same zero-norm cosine guard (indexer.py:117-119). */
  private[operators] def distLocal(
      metric: Metric, x: Array[Float], y: Array[Float]): Double =
    metric match {
      case Euclidean =>
        var s = 0.0
        var i = 0
        while (i < x.length) {
          val d = x(i).toDouble - y(i).toDouble
          s += d * d
          i += 1
        }
        math.sqrt(s)
      case Manhattan =>
        var s = 0.0
        var i = 0
        while (i < x.length) {
          s += math.abs(x(i).toDouble - y(i).toDouble)
          i += 1
        }
        s
      case DotProduct =>
        var s = 0.0
        var i = 0
        while (i < x.length) { s += x(i).toDouble * y(i).toDouble; i += 1 }
        -s
      case Cosine =>
        var na = 0.0
        var i = 0
        while (i < x.length) { val v = x(i).toDouble; na += v * v; i += 1 }
        var nb = 0.0
        i = 0
        while (i < y.length) { val v = y(i).toDouble; nb += v * v; i += 1 }
        if (na == 0.0 || nb == 0.0) 1.0
        else {
          var dot = 0.0
          i = 0
          while (i < x.length) { dot += x(i).toDouble * y(i).toDouble; i += 1 }
          1.0 - dot / (math.sqrt(na) * math.sqrt(nb))
        }
    }

  /** Top-k per query over `corpus`. Output: (query_id, idCol, dist),
    * exactly k rows per query (fewer when the corpus is smaller), ties
    * broken by id ascending like FlatKnn (FIXTURES.md §C). */
  def search(
      corpus: DataFrame,
      queries: Seq[(Long, Seq[Float])],
      k: Int,
      metric: Metric = Euclidean,
      idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame = {
    require(queries.nonEmpty, "empty query batch")
    // k <= 0 would reach h.head on an empty heap inside an executor —
    // an opaque task failure instead of this message
    require(k > 0, s"k must be positive, got $k")
    // duplicate query ids would build separate heaps whose candidates
    // MERGE under one id in the phase-2 window — a top-k of the mixed
    // pool, correct for neither vector, with no error
    require(queries.map(_._1).distinct.size == queries.size,
      "query batch contains duplicate query ids")
    val dims = queries.map(_._2.length).distinct
    require(dims.size == 1, s"query batch mixes dimensions: $dims")
    val qDim = dims.head
    // the internal encoder is (Long, Array[Float]); a non-integral id
    // column would cast to NULL and die as an opaque executor-side
    // encoder error — fail loudly at the driver instead
    val idType = corpus.schema(idCol).dataType
    require(
      idType == org.apache.spark.sql.types.LongType ||
        idType == org.apache.spark.sql.types.IntegerType ||
        idType == org.apache.spark.sql.types.ShortType,
      s"BatchKnn needs an integral id column; '$idCol' is $idType — " +
        "string-keyed corpora use FlatKnn / HnswIndex.searchPartitionedKeyed")
    val spark = corpus.sparkSession
    import spark.implicits._
    val qArr: Array[(Long, Array[Float])] =
      queries.map { case (qid, v) => (qid, v.toArray) }.toArray
    val bc = spark.sparkContext.broadcast(qArr)

    // candidate rows leave each partition WITHOUT embeddings: the heap
    // evicts on (dist, id), so surviving entries are the partition-local
    // top-k per query — deterministic regardless of input order
    val candidates = corpus
      .select(col(idCol).cast("long").as("id"), col(embCol).cast("array<float>"))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val qs = bc.value
        // max-heap on (dist, id): the root is the WORST kept candidate
        val ord = Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long)
        val heaps = Array.fill(qs.length)(
          scala.collection.mutable.PriorityQueue.empty[(Double, Long)](ord))
        while (it.hasNext) {
          val (id, emb) = it.next()
          // rows with UNDEFINED (NULL) distance never enter a heap —
          // the single-query path ranks them NULL-last (FlatKnn's
          // asc_nulls_last): see the deliberate-divergence note in the
          // class doc. Definedness mirrors the VectorDistance kernel
          // EXACTLY, including its cosine guard-before-length order: a
          // zero-norm side defines the guard value even when the dims
          // mismatch, so such a row ranks identically here and in
          // FlatKnn (it can legitimately beat anti-correlated rows).
          if (emb != null) {
            val sameDim = emb.length == qDim
            var qi = 0
            while (qi < qs.length) {
              val q = qs(qi)._2
              var defined = sameDim
              var d = 0.0
              if (sameDim) d = distLocal(metric, emb, q)
              else if (metric == Cosine) {
                var na = 0.0
                var i = 0
                while (i < emb.length) { val v = emb(i).toDouble; na += v * v; i += 1 }
                var nb = 0.0
                i = 0
                while (i < q.length) { val v = q(i).toDouble; nb += v * v; i += 1 }
                if (na == 0.0 || nb == 0.0) { defined = true; d = 1.0 }
              }
              if (defined) {
                val h = heaps(qi)
                if (h.size < k) h.enqueue((d, id))
                else if (ord.lt((d, id), h.head)) { h.dequeue(); h.enqueue((d, id)) }
              }
              qi += 1
            }
          }
        }
        heaps.iterator.zipWithIndex.flatMap { case (h, qi) =>
          val qid = qs(qi)._1
          h.iterator.map { case (d, id) => (qid, id, d) }
        }
      }
      .toDF("query_id", idCol, "dist")

    // phase 2: the only shuffle — partitions × Q × k candidate rows
    val w = Window.partitionBy("query_id")
      .orderBy(col("dist").asc, col(idCol).asc)
    candidates
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= k)
      .drop("__rn")
  }

  /** Convenience: embed a batch of query texts with the library's model
    * semantics and search — one corpus pass for the whole batch. */
  def searchTexts(
      corpus: DataFrame,
      queryTexts: Seq[String],
      embed: String => Array[Float],
      k: Int,
      metric: Metric = Euclidean,
      idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame =
    search(
      corpus,
      queryTexts.zipWithIndex.map { case (t, i) => (i.toLong, embed(t).toSeq) },
      k, metric, idCol, embCol)
}
