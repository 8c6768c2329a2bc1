package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.catalog.Models

/** Ingest adapters that turn external corpus formats into the chunk
  * shape `LibraryCatalog.createLibrary` expects. The reference's own
  * corpus fixture is a two-column CSV `(chunk, document_name)`
  * (`tests/chunks_test.csv`, loaded by `tests/test_e2e.py:23-52` into
  * nested create-library requests); [[fromChunkCsv]] reads that shape
  * directly into a chunks DataFrame — document ids derive from the
  * document name, chunk ids number within each document.
  */
object ChunkSources {

  /** Read a `(chunk, document_name)` CSV into catalog-ready chunks.
    * Deterministic ids: document_id = "doc-" + name slug; chunk id =
    * document slug + "#" + the chunk's ordinal within its document
    * (ordered by first-seen file order via a window). */
  def fromChunkCsv(
      spark: SparkSession,
      path: String,
      source: String = "csv"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val raw = spark.read
      .option("header", "true")
      .option("multiLine", "true")
      .option("escape", "\"")
      .csv(path)
      .select(
        col("chunk").as("text"),
        col("document_name").as("__doc_name"))
      .where(col("text").isNotNull)
    val slug = regexp_replace(lower(trim(col("__doc_name"))), "[^a-z0-9]+", "-")
    val w = Window.partitionBy("__doc_name").orderBy("text")
    raw
      .withColumn("__slug", slug)
      .withColumn("__ord", row_number().over(w))
      .select(
        concat(col("__slug"), lit("#"), col("__ord")).as("id"),
        concat(lit("doc-"), col("__slug")).as("document_id"),
        col("text"),
        struct(
          lit(source).as("source"),
          lit(null).cast("timestamp").as("created_at"),
          array(col("__slug")).as("tags"),
          lit(null).cast("string").as("author"),
          col("__doc_name").as("title"),
          lit(null).cast("string").as("description"),
          lit(null).cast("int").as("page")).as("metadata"))
  }

  /** The reference's nested create-library request shape
    * (endpoints/libraries.py:19, test_e2e.py:26-49): one JSON record per
    * document — `{title, description, metadata: {source, tags}, chunks:
    * [{text, metadata: ...}]}` — flattened to catalog-ready chunk rows.
    * Document-level title/description ride into each chunk's metadata,
    * which is exactly what the derived documents view re-aggregates. */
  def fromNestedJson(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.option("multiLine", "true").json(path)
    require(raw.columns.contains("chunks") && raw.columns.contains("title"),
      "nested source needs 'title' and 'chunks' fields")
    val slug = regexp_replace(lower(trim(col("title"))), "[^a-z0-9]+", "-")
    val docTags =
      if (raw.select("metadata.*").columns.contains("tags")) col("metadata.tags")
      else lit(null).cast("array<string>")
    raw
      .select(
        col("title").as("__title"),
        (if (raw.columns.contains("description")) col("description")
         else lit(null).cast("string")).as("__description"),
        docTags.cast("array<string>").as("__tags"),
        slug.as("__slug"),
        posexplode(col("chunks")).as(Seq("__ord", "__chunk")))
      .select(
        concat(col("__slug"), lit("#"), col("__ord") + 1).as("id"),
        concat(lit("doc-"), col("__slug")).as("document_id"),
        col("__chunk.text").as("text"),
        struct(
          lit("nested-json").as("source"),
          lit(null).cast("timestamp").as("created_at"),
          coalesce(col("__tags"), array().cast("array<string>")).as("tags"),
          lit(null).cast("string").as("author"),
          col("__title").as("title"),
          col("__description").as("description"),
          lit(null).cast("int").as("page")).as("metadata"))
  }

  /** Generic JSONL adapter: one object per line with at least a `text`
    * field; optional `id`/`document_id`/`source` pass through, missing
    * pieces are normalized by the catalog on ingest. */
  def fromJsonl(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.json(path)
    require(raw.columns.contains("text"), "JSONL source needs a 'text' field")
    // JSON schema inference makes a column exist if ANY record has it —
    // per-record absence means null, so default via coalesce, not
    // column presence
    val withId =
      if (raw.columns.contains("id"))
        raw.withColumn("id", coalesce(col("id"), expr("uuid()")))
      else raw.withColumn("id", expr("uuid()"))
    val withDoc =
      if (withId.columns.contains("document_id"))
        withId.withColumn("document_id",
          coalesce(col("document_id"), lit("doc-default")))
      else withId.withColumn("document_id", lit("doc-default"))
    withDoc.select("id", "document_id", "text")
  }
}
