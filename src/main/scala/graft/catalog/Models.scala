package graft.catalog

import org.apache.spark.sql.types._

/** Schemas of the library data model (SURVEY.md §1.4), the Spark mirror
  * of the reference's Pydantic models (`app/core/models/chunk.py:45-53`,
  * `document.py:37-53`, `library.py:32-43`). Fixed, declared, enforced on
  * every load — the reference has no schema inference and neither do we.
  */
object Models {

  /** chunk.metadata STRUCT (chunk.py:8-23). */
  val chunkMetadataType: StructType = StructType(Seq(
    StructField("source", StringType, nullable = true),
    StructField("created_at", TimestampType, nullable = true),
    StructField("tags", ArrayType(StringType, containsNull = false), nullable = true),
    StructField("author", StringType, nullable = true),
    StructField("title", StringType, nullable = true),
    StructField("description", StringType, nullable = true),
    StructField("page", IntegerType, nullable = true)))

  /** The central chunks table (chunk.py:45-53). */
  val chunkSchema: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("document_id", StringType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("embedding", ArrayType(FloatType, containsNull = false), nullable = true),
    StructField("metadata", chunkMetadataType, nullable = true)))

  /** documents table (document.py:37-53). The reference's denormalized
    * `chunks: list[str]` id list is NOT stored — document membership is
    * derived from chunks.document_id by aggregation (SURVEY §1.4), which
    * also sidesteps the reference's add_chunks cross-document bug
    * (library.py:107). */
  val documentSchema: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("title", StringType, nullable = true),
    StructField("description", StringType, nullable = true),
    StructField("source", StringType, nullable = true),
    StructField("tags", ArrayType(StringType, containsNull = false), nullable = true)))

  /** Pluggable index types (schemas/library.py:10-13; ivf is
    * beyond-reference, SURVEY §2 extras). */
  sealed trait IndexerType { def name: String }
  case object FlatIndexer extends IndexerType { val name = "flat" }
  case object LshIndexer extends IndexerType { val name = "lsh" }
  case object HnswIndexer extends IndexerType { val name = "hnsw" }
  case object IvfIndexer extends IndexerType { val name = "ivf" }
  case object IvfPqIndexer extends IndexerType { val name = "ivfpq" }
  object IndexerType {
    val all: Seq[IndexerType] =
      Seq(FlatIndexer, LshIndexer, HnswIndexer, IvfIndexer, IvfPqIndexer)
    def fromString(s: String): IndexerType = all
      .find(_.name == s.toLowerCase)
      .getOrElse(throw new IllegalArgumentException(s"unknown indexer: $s"))
  }

  /** Library-level metadata persisted in meta.json (library.py:18-29:
    * created_at/updated_at/tags). `embedder` names the registered
    * embedding model (Embedder.models) the library's chunks were
    * embedded with — queries must embed with the SAME model. `buckets`
    * is the chunk-bucket count chosen at create time: every later
    * mutation must agree on the id→bucket mapping, so it is immutable
    * per library and persisted with it (8 suits small libraries; size it
    * so a bucket's rows fit one executor comfortably — a 100 TB corpus
    * wants thousands). */
  case class LibraryMeta(
      name: String,
      indexer: IndexerType,
      dim: Int,
      version: Long,
      createdAt: String,
      updatedAt: String,
      embedder: String = "md5",
      tags: Seq[String] = Seq.empty,
      buckets: Int = 8)
}
