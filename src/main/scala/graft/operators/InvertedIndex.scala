package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Embedder

/** Persisted positional inverted index over a space-tokenized corpus,
  * plus the two lookups a lexical retrieval stack needs: conjunctive
  * (AND) term search and exact phrase search.
  *
  * The reference serves vector search only (`app/api/services/
  * library_service.py:173-230`); this is the lexical complement — the
  * same role BM25 plays in `functions/Bm25.scala`, but backed by a
  * PERSISTED index so a lookup reads postings for its query terms
  * instead of scanning the corpus text.
  *
  * 100 TB design:
  *  - Postings are plain `(term, doc_id, pos)` rows — merge-friendly
  *    (an incremental batch appends its own postings; no array
  *    re-grouping) — written `partitionBy(bucket)` where
  *    `bucket = md5prefix(term) % NumBuckets`. A lookup reads ONLY the
  *    buckets of its query terms (PartitionFilters — pinned in
  *    InvertedIndexSpec) and pushes `term = …` into the parquet row
  *    groups; corpus text is never touched at query time.
  *  - Build is one pass: posexplode → repartition(bucket) → write.
  *    The single shuffle keys on bucket so each bucket directory is
  *    written by one task (bounded file counts, no small-file storm
  *    from every task writing every bucket).
  *  - Phrase match is join-shaped, not window-shaped: an occurrence of
  *    the i-th phrase term at position p implies a candidate phrase
  *    START at `p - i`, so an n-term phrase is an n-way EQUI-join of
  *    per-term postings on `(doc_id, start)` — co-partitioned hash
  *    joins on identical keys, no positional window over the corpus,
  *    no array re-scan. Only postings of the query terms shuffle.
  */
object InvertedIndex {

  /** DEFAULT term-hash partition count for NEW indexes. At 100 TB this
    * scales up (e.g. 4096) so one bucket ≈ one task's worth of
    * postings; the lookup cost stays |query terms| buckets. The count
    * is a BUILD parameter persisted WITH the index (`_meta.txt`) and
    * read back by [[read]] — pruning with a different modulus than the
    * build's would select partitions that don't hold the terms'
    * postings and silently return false negatives (the same
    * wrong-parameter-restore class the HNSW artifacts guard against). */
  val NumBuckets = 32

  private val MetaFile = "_meta.txt"

  /** Catalyst-side bucket of a term (md5-prefix hash, NOT Spark's
    * seed-dependent `hash()` — the driver must compute the same value
    * without a job, see [[bucketOf]]). */
  def bucketCol(term: Column, numBuckets: Int = NumBuckets): Column =
    pmod(Embedder.md5Int(term), lit(numBuckets.toLong)).cast("int")

  /** Driver-side twin of [[bucketCol]] (equality over the whole vocab
    * pinned in InvertedIndexSpec) — lets a lookup prune partitions
    * with literal INT bucket ids (matching the discovered partition
    * column type, so pruning sees no cast), no helper job. */
  def bucketOf(term: String, numBuckets: Int = NumBuckets): Int =
    java.lang.Math.floorMod(Embedder.md5IntLocal(term), numBuckets.toLong).toInt

  /** The token stream with 0-based positions: one `(term, doc_id, pos,
    * bucket)` row per token occurrence. Tokenization is the corpus
    * discipline used everywhere else (single-space split; empty tokens
    * dropped AFTER positions are assigned, so positions are stable
    * under repeated separators). */
  def postings(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs
      .select(
        col(idCol).as("doc_id"),
        posexplode(split(col(textCol), " ", -1)).as(Seq("pos", "term")))
      .where(length(col("term")) > 0)
      .withColumn("bucket", bucketCol(col("term")))

  /** Build the persisted index: one pass over the corpus, one shuffle
    * (keyed on bucket so each bucket directory is one task's output).
    * The bucket count is persisted beside the data — it is a build
    * parameter of the layout, not a constant of the code. */
  def build(
      docs: DataFrame,
      path: String,
      idCol: String = "doc_id",
      textCol: String = "text"): Unit = {
    postings(docs, idCol, textCol)
      .repartition(col("bucket"))
      .write
      .mode("overwrite")
      .partitionBy("bucket")
      .parquet(path)
    val p = new org.apache.hadoop.fs.Path(path, MetaFile)
    val fs = p.getFileSystem(
      docs.sparkSession.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(s"num_buckets=$NumBuckets".getBytes("UTF-8"))
    finally out.close()
  }

  /** The bucket count a persisted index was BUILT with (None for
    * indexes predating the meta file — those were all built at the
    * then-and-now default). */
  def persistedNumBuckets(spark: SparkSession, path: String): Option[Int] = {
    val p = new org.apache.hadoop.fs.Path(path, MetaFile)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val body = scala.io.Source.fromInputStream(in, "UTF-8").mkString
        body.linesIterator.collectFirst {
          case l if l.startsWith("num_buckets=") =>
            l.stripPrefix("num_buckets=").trim.toInt
        }
      } finally in.close()
    }
  }

  /** Read + VALIDATE: pruning with a different modulus than the index
    * was built under selects partitions that don't hold the query
    * terms' postings — matching documents would vanish with NO error.
    * A persisted count that differs from this code's [[NumBuckets]]
    * therefore fails loudly (rebuild the index, or run the matching
    * code version) instead of silently returning false negatives. */
  def read(spark: SparkSession, path: String): DataFrame = {
    persistedNumBuckets(spark, path).foreach(nb =>
      require(nb == NumBuckets,
        s"inverted index at $path was built with num_buckets=$nb but this " +
          s"code prunes with $NumBuckets — lookups would silently miss " +
          "documents; rebuild the index"))
    spark.read.parquet(path)
  }

  /** Pruned postings for a query term set: partition filter on the
    * terms' literal bucket ids + a pushed `term IN (…)` row filter. */
  private def termPostings(idx: DataFrame, terms: Seq[String]): DataFrame = {
    val buckets = terms.map(bucketOf(_)).distinct
    idx.where(
      col("bucket").isin(buckets: _*) && col("term").isin(terms: _*))
  }

  /** Documents containing ALL of `terms` (conjunctive lookup). Shape:
    * distinct (doc_id, term) → one groupBy counting matched terms —
    * only postings of the query terms shuffle, never the corpus. */
  def conjunctiveSearch(idx: DataFrame, terms: Seq[String]): DataFrame = {
    val uniq = terms.distinct
    require(uniq.nonEmpty, "conjunctiveSearch needs at least one term")
    termPostings(idx, uniq)
      .select("doc_id", "term")
      .distinct()
      .groupBy("doc_id")
      .agg(count(lit(1)).as("__n_terms"))
      .where(col("__n_terms") === uniq.size)
      .select("doc_id")
  }

  /** `(doc_id, n_hits)` for documents containing the exact phrase
    * (adjacent tokens, in order), with the per-document occurrence
    * count. Each leg projects its term's postings to the implied
    * phrase start (`pos - i`); the n-way equi-join on `(doc_id,
    * start)` keeps exactly the aligned occurrences. Duplicate phrase
    * terms are handled naturally (each leg filters independently). */
  def phraseSearch(idx: DataFrame, phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phraseSearch needs at least one term")
    val p = termPostings(idx, phrase.distinct)
    val legs = phrase.zipWithIndex.map { case (term, i) =>
      p.where(col("term") === term)
        .select(col("doc_id"), (col("pos") - lit(i)).as("start"))
    }
    legs
      .reduce((a, b) => a.join(b, Seq("doc_id", "start")))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_hits"))
  }
}
