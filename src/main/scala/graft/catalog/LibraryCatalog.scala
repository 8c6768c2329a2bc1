package graft.catalog

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.slf4j.LoggerFactory

import graft.catalog.Models._
import graft.functions.{Embedder, Md5Expressions, VectorFunctions}
import graft.functions.VectorFunctions.{Euclidean, Metric}
import graft.operators.{FlatKnn, HnswIndex, IvfIndex, LshIndex, PqIndex}

/** The library store: persistence, recovery, CRUD, and the full search
  * read path — the Spark-native replacement for the reference's service
  * layer (`library_service.py`, `chunk_service.py`, `document_service.py`)
  * and pickle persistence (`library.py:120-144`,
  * `dependencies.py:36-67`).
  *
  * Design (SURVEY.md §7.1/§7.2.5):
  *  - A library is a versioned pair of parquet tables + an optional index
  *    table under `<warehouse>/<name>/v<NNNNNN>/{chunks,index}`, with a
  *    `meta.json` pointer. Mutations never modify files in place: they
  *    write version N+1 and atomically swap the pointer (tmp + rename) —
  *    immutability + catalog swap replaces the reference's per-library
  *    locks (`library.py:59`, `dependencies.py:28-32`), and in-flight
  *    readers of version N are undisturbed. The previous version is kept
  *    for them; older ones are garbage-collected.
  *  - Mutations are pure DataFrame transforms: add = union, delete =
  *    anti-join, update = anti-join + union. The LSH signature table is
  *    maintained incrementally on add (indexer.add, `lsh.py:84-112`) and
  *    rebuilt on delete/update-heavy paths (the reference rebuilds on
  *    batch add and document delete too, `library.py:113-114`,
  *    `document_service.py:104-123`).
  *  - Documents are DERIVED from chunks by `document_id` aggregation —
  *    the reference's denormalized per-document chunk-id list is state we
  *    refuse to duplicate (and its add_chunks cross-document bug,
  *    `library.py:107`, cannot exist here).
  *
  * At 100 TB: every path here is a scan→transform→write of partitioned
  * parquet; nothing collects rows to the driver. The version swap is one
  * small-file rename regardless of data size. Mutations are
  * bucket-level copy-on-write — chunks are bucketed by
  * `pmod(md5_prefix_int(id), meta.buckets)` (bucket count fixed per
  * library at create time), a mutation READS and rewrites
  * only the buckets holding affected rows (the manifest names their leaf
  * dirs; unchanged buckets are referenced, not copied — the
  * Iceberg/Delta pattern), so a single-chunk update touches
  * 1/buckets of the data and zero bytes of the rest. The index gets
  * the same treatment via `artifacts.txt` version lists: appends write
  * only the new rows' part, deletes write only an id-tombstone part
  * (deletion vectors), metadata-only mutations carry every artifact
  * forward by reference, and full commits compact. All partitioned
  * writes are clustered (one shuffle keyed by partition value + a small
  * salt) so output files stay bounded per directory at any scale.
  */
class LibraryCatalog(
    spark: SparkSession,
    warehouse: String,
    hnswMaxRows: Int = HnswIndex.DefaultMaxRows,
    lshMaxFlips: Int = 0,
    autoCompactRefs: Int = LibraryCatalog.DefaultAutoCompactRefs) {

  private val log = LoggerFactory.getLogger(classOf[LibraryCatalog])
  private def fs: FileSystem =
    new Path(warehouse).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Per-library writer serialization within this JVM (the reference's
    * per-library lock, library.py:59/dependencies.py:28-32 — writers
    * only; readers need no lock because versions are immutable).
    * Cross-process writers are caught by [[claimVersion]]'s atomic
    * claim instead. Keyed by warehouse + name so independent catalogs
    * in one process don't contend. */
  private def withWriteLock[T](name: String)(f: => T): T =
    LibraryCatalog.writeLocks
      .computeIfAbsent(s"$warehouse#$name", _ => new Object)
      .synchronized(f)

  private def libDir(name: String) = new Path(warehouse, name)
  private def metaPath(name: String) = new Path(libDir(name), "meta.json")
  private def versionDir(name: String, v: Long) =
    new Path(libDir(name), f"v$v%06d")

  // ---------------------------------------------------------------- meta

  /** Library names become filesystem paths and meta.json fields, and
    * tags ride the hand-built JSON — both are validated LOUDLY at write
    * time: a quote in a name would silently truncate through the meta
    * round-trip and later commits would write into a phantom directory;
    * a '/' or '..' would escape the warehouse. */
  private def validateName(name: String): Unit =
    require(
      name.matches("[A-Za-z0-9][A-Za-z0-9._-]{0,127}") && !name.contains(".."),
      s"invalid library name '$name': must match [A-Za-z0-9][A-Za-z0-9._-]* " +
        "(no quotes, slashes, or parent-dir segments)")

  private def validateTags(tags: Seq[String]): Unit =
    tags.foreach(t =>
      require(!t.exists(c => c == '"' || c == '\\' || c == ']' || c < ' '),
        s"""library tag contains unsupported characters ('"', '\\', ']', control): $t"""))

  private def writeMeta(m: LibraryMeta): Unit = {
    validateTags(m.tags)
    val tagsJson = m.tags.map(t => s""""$t"""").mkString("[", ",", "]")
    val json =
      s"""{"name":"${m.name}","indexer":"${m.indexer.name}","dim":${m.dim},""" +
        s""""embedder":"${m.embedder}","tags":$tagsJson,"buckets":${m.buckets},""" +
        s""""version":${m.version},"created_at":"${m.createdAt}","updated_at":"${m.updatedAt}"}"""
    val tmp = new Path(libDir(m.name), "meta.json.tmp")
    val out = fs.create(tmp, true)
    out.write(json.getBytes("UTF-8"))
    out.close()
    // OVERWRITE rename is the atomic pointer swap (M10's lock
    // replacement): a delete-then-rename pair would leave a no-meta
    // window that a lock-free concurrent reader could hit as a spurious
    // "library not found"
    try
      org.apache.hadoop.fs.FileContext
        .getFileContext(metaPath(m.name).toUri, fs.getConf)
        .rename(tmp, metaPath(m.name),
          org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    catch {
      case e: Exception =>
        throw new IllegalStateException(s"meta swap failed for ${m.name}", e)
    }
  }

  /** Schema-checked meta load (S3's validation analog for the pointer). */
  def readMeta(name: String): Option[LibraryMeta] = {
    if (!fs.exists(metaPath(name))) return None
    val json =
      try {
        val in = fs.open(metaPath(name))
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      } catch {
        // a checksum/IO failure on a present file IS detected corruption
        case e: java.io.IOException =>
          throw new IllegalStateException(
            s"library '$name': corrupt meta.json at ${metaPath(name)} " +
              s"(${e.getMessage}); restore the file or delete the " +
              "library directory", e)
      }
    def str(k: String) =
      s""""$k":"([^"]*)"""".r.findFirstMatchIn(json).map(_.group(1))
    def num(k: String) =
      (s""""$k":(\\d+)""").r.findFirstMatchIn(json).map(_.group(1).toLong)
    val tags = """"tags":\[([^\]]*)\]""".r
      .findFirstMatchIn(json)
      .map(m => """"([^"]*)"""".r.findAllMatchIn(m.group(1)).map(_.group(1)).toSeq)
      .getOrElse(Seq.empty)
    val parsed = for {
      n <- str("name"); ix <- str("indexer"); d <- num("dim")
      v <- num("version"); c <- str("created_at"); u <- str("updated_at")
    } yield LibraryMeta(n, IndexerType.fromString(ix), d.toInt, v, c, u,
      embedder = str("embedder").getOrElse("md5"), // pre-field metas default
      tags = tags,
      buckets = num("buckets").map(_.toInt).getOrElse(8))
    // an ABSENT meta.json means "no such library" (None above); a PRESENT
    // but unparsable one is corruption and must say so, not masquerade as
    // not-found (the reference's corrupt-pickle handling names the file,
    // tests/test_library_save_load.py corrupt cases)
    if (parsed.isEmpty)
      throw new IllegalStateException(
        s"library '$name': corrupt meta.json at ${metaPath(name)} — " +
          "missing required fields (name/indexer/dim/version/created_at/" +
          "updated_at); restore the file or delete the library directory")
    parsed
  }

  /** The library's embedding model, resolved from meta — an unknown name
    * fails at load, not with silently wrong distances. */
  private def modelOf(m: LibraryMeta): Embedder.Model =
    Embedder.models.getOrElse(m.embedder,
      throw new IllegalArgumentException(
        s"library '${m.name}': unknown embedder '${m.embedder}' " +
          s"(registered: ${Embedder.models.keys.mkString(", ")})"))

  /** A corrupt meta still counts as "exists": the directory is occupied,
    * and the overwrite path (deleteLibrary, no meta read) is how a caller
    * reclaims it. */
  def exists(name: String): Boolean =
    try readMeta(name).isDefined
    catch { case _: IllegalStateException => true }

  /** Startup recovery (S4, dependencies.py:36-67): every directory under
    * the warehouse with a parsable meta.json is a library. Unparsable
    * directories are skipped with a warning, like the reference's
    * corrupt-pickle handling. */
  def listLibraries(): Seq[LibraryMeta] = {
    if (!fs.exists(new Path(warehouse))) return Seq.empty
    val metas = fs.listStatus(new Path(warehouse))
      .filter(_.isDirectory)
      .flatMap { st =>
        val n = st.getPath.getName
        try readMeta(n)
        catch {
          case e: Exception =>
            log.warn(s"skipping unloadable library dir $n: ${e.getMessage}")
            None
        }
      }
      .sortBy(_.name)
      .toSeq
    // startup recovery (S4) extends to the ANN probe registry: a fresh
    // process that recovers its libraries gets their persisted artifacts
    // probe-rewritable without any per-library register call (closures
    // only — no job runs here). Last registration per token wins, same
    // as the commit-time path — but a READ path must never DEREGISTER:
    // listing a warehouse that holds a flat/hnsw library named like a
    // manually registered probe (or like another catalog's library)
    // would silently wipe that token. Deregistration stays exclusive to
    // the mutation paths (commit / delete / rename), which own their
    // library's name.
    metas.foreach(m => syncAnnProbeRegistration(m, allowDeregister = false))
    metas
  }

  // ------------------------------------------------------------- loading

  private def requireMeta(name: String): LibraryMeta =
    readMeta(name).getOrElse(
      throw new NoSuchElementException(s"library not found: $name"))

  // ------------------------------------------- bucketed chunk manifests

  /** Chunk rows are bucketed by a stable hash of their id; a version's
    * `manifest.txt` maps each bucket to the version dirs whose
    * `chunks/__b=<b>` leaves hold its CURRENT rows. Mutations write only
    * the buckets they touch and REFERENCE the rest (Iceberg/Delta-style
    * copy-on-write): appends add a leaf and extend the bucket's list,
    * replaces repoint the bucket at the new version, and a full write
    * (createLibrary) compacts every bucket back to one dir
    * (rebuildIndex compacts only the INDEX refs — chunk data is
    * untouched by a rebuild). At 100 TB a single-chunk update rewrites
    * 1/buckets of the data and zero bytes of the rest; an append
    * rewrites nothing. The bucket COUNT is per-library (LibraryMeta
    * .buckets, fixed at create): the id→bucket mapping must be stable
    * across every mutation of a library's lifetime, but different
    * libraries need different granularity — 8 dirs is right for
    * gigabytes, thousands are right for 100 TB. Create-time default is
    * [[LibraryCatalog.AutoBuckets]] (stats-sized, see
    * [[autoBucketCount]]); these constants bound the auto choice. */
  private val AutoBucketTargetBytes = BigInt(64L << 20)
  private val MaxAutoBuckets = 65536
  /** Bucket count when the input's size estimate is the unusable
    * defaultSizeInBytes sentinel (see [[autoBucketCount]]). */
  private val FallbackBuckets = 8

  /** Catalyst / driver twins of the bucket assignment (md5-prefix of the
    * id — the one hash all engines of this codebase share). */
  private def bucketCol(buckets: Int): Column =
    pmod(Embedder.md5Int(col("id")), lit(buckets)).cast("int")
  private def bucketOfId(id: String, buckets: Int): Int =
    (Embedder.md5IntLocal(id) % buckets).toInt

  private def manifestPath(vdir: Path) = new Path(vdir, "manifest.txt")

  private def writeManifest(vdir: Path, mf: Map[Int, Seq[String]]): Unit = {
    val body = mf.toSeq.sortBy(_._1)
      .map { case (b, dirs) => s"$b=${dirs.mkString(",")}" }
      .mkString("\n")
    val out = fs.create(manifestPath(vdir), true)
    out.write(body.getBytes("UTF-8"))
    out.close()
  }

  private def readSmallTextFile(p: Path): String = {
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  /** Tombstones whose ids the driver already holds (point deletes,
    * small predicate deletes) are written as ONE flat text file by the
    * driver — no 1-task Spark job per mutation just to persist a handful
    * of ids. Reads reconstruct a local relation ([[artifactParts]]).
    * Larger deletes keep the distributed parquet part. */
  private val InlineIdsFile = "ids.txt"
  /** Chunk ids are caller-supplied free text; the inline tombstone file
    * is newline-delimited, so ids are percent-escaped on write and
    * decoded on read — an embedded newline must not split one tombstone
    * into two bogus ids (leaving the real id's stale index rows live
    * and wrongly tombstoning innocents). */
  private def escapeTombstoneId(id: String): String =
    id.flatMap {
      case '%'  => "%25"
      case '\n' => "%0A"
      case '\r' => "%0D"
      case c    => c.toString
    }

  private def unescapeTombstoneId(s: String): String =
    s.replace("%0A", "\n").replace("%0D", "\r").replace("%25", "%")

  private def writeInlineTombstone(vdir: Path, ids: Seq[String]): Unit = {
    val out = fs.create(new Path(new Path(vdir, "index_deletes"), InlineIdsFile), true)
    try out.write(ids.map(escapeTombstoneId).mkString("\n").getBytes("UTF-8"))
    finally out.close()
  }

  private def readManifest(name: String, v: Long): Map[Int, Seq[String]] = {
    val vdir = versionDir(name, v)
    val p = manifestPath(vdir)
    if (!fs.exists(p)) {
      // a version dir WITHOUT its manifest is a torn commit or lost file —
      // treating it as an empty library would silently read no data
      if (v >= 0 && fs.exists(vdir))
        throw new IllegalStateException(
          s"library '$name': version ${vdir.getName} is missing its " +
            s"manifest.txt ($p) — torn commit or corrupt persistence; " +
            "restore the file or delete the library directory")
      return Map.empty
    }
    parseRefLines(p, "manifest", name)(_.toInt)
  }

  /** Leaf directories (one per (bucket, owning version)) of a manifest —
    * version dir names are library-relative, so renames ride along. */
  private def chunkLeafPaths(name: String, mf: Map[Int, Seq[String]]): Seq[String] =
    mf.toSeq.sortBy(_._1).flatMap { case (b, dirs) =>
      dirs.map(d => new Path(new Path(libDir(name), d), s"chunks/__b=$b").toString)
    }

  private def readChunksAt(name: String, mf: Map[Int, Seq[String]]): DataFrame = {
    val paths = chunkLeafPaths(name, mf)
    if (paths.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], chunkSchema)
    else spark.read.schema(chunkSchema).parquet(paths: _*)
  }

  /** Schema-enforced chunks load (S3): read with the declared schema so
    * drift fails loudly at the scan, not deep in a query. */
  def chunks(name: String): DataFrame = {
    val m = requireMeta(name)
    readChunksAt(name, readManifest(name, m.version))
  }

  /** Time-travel read: the chunks exactly as of `version`. Falls out of
    * the versioned design for free — every version's manifest is a
    * complete, immutable snapshot description; a version is readable
    * while GC retains it (current and previous always are; see
    * [[finishCommit]]). Reading a GC'd version fails loudly. */
  def chunksAt(name: String, version: Long): DataFrame = {
    requireMeta(name) // library must exist
    val mf = readManifest(name, version)
    require(mf.nonEmpty || fs.exists(manifestPath(versionDir(name, version))),
      s"library '$name' has no readable version $version " +
        "(never committed, or already garbage-collected)")
    readChunksAt(name, mf)
  }

  /** Derived documents view (Models.documentSchema, document.py:37-53):
    * membership + counts by aggregation (A2), document-level
    * title/description/source as the min non-null over the document's
    * chunks (deterministic pick), tags as the sorted distinct union.
    * chunk_ids are sorted — collect_list order is not deterministic. */
  def documents(name: String): DataFrame =
    chunks(name)
      .groupBy(col("document_id").as("id"))
      .agg(
        min(col("metadata.title")).as("title"),
        min(col("metadata.description")).as("description"),
        min(col("metadata.source")).as("source"),
        array_sort(array_distinct(flatten(collect_list(col("metadata.tags")))))
          .as("tags"),
        count(lit(1)).as("chunk_count"),
        array_sort(collect_list(col("id"))).as("chunk_ids"))

  /** One persisted file-set of a library's index. `partitionBy` is the
    * physical layout the probe prunes on: table_idx for LSH, cell for
    * IVF (see LshIndex/IvfIndex scale notes); `sortWithin` orders rows
    * inside each partition dir so equality probes skip row groups too. */
  private case class IndexArtifact(
      name: String,
      df: DataFrame,
      partitionBy: Seq[String],
      sortWithin: Seq[String] = Nil)

  private def artifactPartitioning(ix: IndexerType, artifact: String): Seq[String] =
    (ix, artifact) match {
      case (LshIndexer, "index")   => Seq("table_idx")
      case (IvfIndexer, "index")   => Seq("cell")
      case (IvfPqIndexer, "index") => Seq("cell")
      case _                       => Nil
    }

  private def artifactSortWithin(ix: IndexerType, artifact: String): Seq[String] =
    (ix, artifact) match {
      case (LshIndexer, "index") => Seq("sig")
      case _                     => Nil
    }

  // --------------------------------------- index artifact version lists

  /** `artifacts.txt` gives each index artifact the same version-list
    * treatment as chunk buckets: the CURRENT index = the union of the
    * `index/` parts in the listed version dirs MINUS the ids in the
    * listed `index_deletes/` parts — with a delete applying only to parts
    * OLDER than itself, so a delete+append commit (updateChunk) keeps the
    * re-added rows. Appends and deletes therefore write O(delta) bytes
    * per mutation (the Delta-Lake deletion-vector pattern); full commits
    * (createLibrary / rebuildIndex) compact the lists back to one entry,
    * which also bounds the read-side part count between rebuilds. */
  private def artifactRefsPath(vdir: Path) = new Path(vdir, "artifacts.txt")

  private def writeArtifactRefs(
      vdir: Path, refs: Map[String, Seq[String]]): Unit = {
    val body = refs.toSeq.sortBy(_._1)
      .map { case (a, dirs) => s"$a=${dirs.mkString(",")}" }
      .mkString("\n")
    val out = fs.create(artifactRefsPath(vdir), true)
    out.write(body.getBytes("UTF-8"))
    out.close()
  }

  /** Strict `k=v1,v2` line parser shared by the manifest and the
    * artifact version lists — BOTH must fail loudly on a torn or
    * garbled file: a silently-partial parse masquerades as "flat
    * library" / "empty bucket" and reads wrong data with no error
    * (detected corruption must never degrade into a quiet full scan). */
  private def parseRefLines[K](
      p: Path, what: String, name: String)(key: String => K): Map[K, Seq[String]] =
    try readSmallTextFile(p).linesIterator
      .filter(_.nonEmpty)
      .map { line =>
        val i = line.indexOf('=')
        require(i > 0, s"malformed line: $line")
        key(line.substring(0, i)) ->
          line.substring(i + 1).split(",").filter(_.nonEmpty).toSeq
      }
      .toMap
    catch {
      case e: Exception =>
        throw new IllegalStateException(
          s"library '$name': corrupt $what at $p (${e.getMessage}); " +
            "restore the file or delete the library directory", e)
    }

  private def readArtifactRefs(
      name: String, v: Long): Map[String, Seq[String]] = {
    if (v < 0) return Map.empty
    val vdir = versionDir(name, v)
    val p = artifactRefsPath(vdir)
    if (!fs.exists(p)) {
      // every commit writes artifacts.txt (empty for flat libraries), so
      // a published version dir without one is a torn commit — same
      // contract as a missing manifest
      if (fs.exists(vdir))
        throw new IllegalStateException(
          s"library '$name': version ${vdir.getName} is missing its " +
            s"artifacts.txt ($p) — torn commit or corrupt persistence; " +
            "restore the file or delete the library directory")
      return Map.empty
    }
    parseRefLines(p, "artifacts.txt", name)(identity)
  }

  /** An artifact's parquet schema never changes over a library's
    * lifetime (the indexer type is fixed at create), so it is inferred
    * from footers ONCE and every later part read passes it explicitly —
    * otherwise each part of each artifact read re-runs footer inference,
    * a per-read fixed cost that dominates small index reads. */
  private val artifactSchemas =
    new scala.collection.concurrent.TrieMap[(String, String), org.apache.spark.sql.types.StructType]

  /** Union of an artifact's parts across its referenced version dirs,
    * each row tagged with its part's version (`__pv`) for delete
    * reconciliation. A part is either a parquet dir or an inline
    * driver-written id list (see [[writeInlineTombstone]]) — the latter
    * becomes a local relation, so reading it schedules no scan. */
  private def artifactParts(
      name: String, artifactName: String, dirs: Seq[String]): DataFrame =
    dirs.map { d =>
      val part = new Path(new Path(libDir(name), d), artifactName)
      val inline = new Path(part, InlineIdsFile)
      val base =
        if (fs.exists(inline))
          idsDf(readSmallTextFile(inline).linesIterator
            .map(unescapeTombstoneId).toSeq)
        else {
          val key = (name, artifactName)
          artifactSchemas.get(key) match {
            case Some(schema) => spark.read.schema(schema).parquet(part.toString)
            case None =>
              val df = spark.read.parquet(part.toString)
              artifactSchemas.putIfAbsent(key, df.schema)
              df
          }
        }
      base.withColumn("__pv", lit(d.stripPrefix("v").toLong))
    }.reduce(_ unionByName _)

  private def artifact(name: String, artifactName: String): Option[DataFrame] =
    artifactAt(name, artifactName, requireMeta(name).version)

  /** Version-PINNED artifact read: one query must pair version-v chunks
    * with version-v artifacts — re-resolving the meta pointer per
    * artifact would let a concurrent commit hand a single search
    * v-chunks and v+1-index (wrong candidate sets, and the wrong graph
    * memoized under v's cache key). */
  private def artifactAt(
      name: String, artifactName: String, v: Long): Option[DataFrame] = {
    val refs = readArtifactRefs(name, v)
    refs.get(artifactName).filter(_.nonEmpty).map { dirs =>
      val parts = artifactParts(name, artifactName, dirs)
      val reconciled =
        refs.get(artifactName + "_deletes").filter(_.nonEmpty) match {
          case Some(dd) =>
            // tombstones are tiny (deleted ids only): broadcast them and
            // keep a part row unless a STRICTLY NEWER delete covers it
            val dels = artifactParts(name, artifactName + "_deletes", dd)
              .groupBy("id").agg(max("__pv").as("__dv"))
            parts
              .join(broadcast(dels), Seq("id"), "left_outer")
              .where(col("__dv").isNull || col("__pv") >= col("__dv"))
              .drop("__dv")
          case None => parts
        }
      reconciled.drop("__pv")
    }
  }

  /** The LOGICAL index table: referenced parts unioned, deletion
    * vectors applied. Directly after createLibrary/rebuildIndex this is
    * one pruned parquet scan; between rebuilds it adds one scan per
    * append and a broadcast anti-semantics join when deletes exist. */
  def indexTable(name: String): Option[DataFrame] = artifact(name, "index")

  /** The persisted IVF centroids table (cid, embedding), when present. */
  def centroidsTable(name: String): Option[DataFrame] = artifact(name, "centroids")

  /** The persisted PQ codebook table (s, j, vals), when present —
    * build-once like the centroids: a quantizer, not data, carried
    * forward by reference across delta commits. */
  def codebookTable(name: String): Option[DataFrame] = artifact(name, "codebook")

  /** The reconciled over-cap partitioned-graph artifact, when present
    * (IndexPersistenceSpec's patch-equals-rebuild pinning hook). */
  private[graft] def hnswPartsTable(name: String): Option[DataFrame] =
    artifact(name, "hnsw_parts")

  // ------------------------------------------------------------- writing

  private def now(): String = java.time.Instant.now().toString

  /** `lshMaxFlips` > 0 opts the catalog's LSH probes into multi-probe
    * (K7): sparse buckets are widened by Hamming-ball signature flips
    * BEFORE the under-k fallback can degrade the probe to a corpus scan
    * — same results whenever the base probe already held >= k rows (the
    * extra candidates only ever ADD to the exact re-rank's input).
    * Signatures on disk are untouched; only the probe set widens. */
  private def lshParams(dim: Int) =
    LshIndex.Params(dim = dim, maxFlips = lshMaxFlips)
  private def ivfParams = IvfIndex.Params()
  private def pqParams = PqIndex.Params()

  /** Buckets that got a leaf dir in this version's chunks write. */
  private def presentBuckets(vdir: Path): Set[Int] = {
    val cdir = new Path(vdir, "chunks")
    if (!fs.exists(cdir)) return Set.empty
    fs.listStatus(cdir)
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(_.startsWith("__b="))
      .map(_.stripPrefix("__b=").toInt)
      .toSet
  }

  /** Files-per-partition-dir salt for clustered writes: without
    * clustering every write task emits a file into EVERY partition dir
    * (tasks × dirs small files per commit); with it, output is bounded
    * at WriteSaltFiles files per dir. 1 is right for local benches
    * (file/committer overhead dominates); raise it on a real cluster
    * where per-bucket write bandwidth is the constraint. */
  private val WriteSaltFiles = 1

  /** A delta whose whole input fits in one scan partition doesn't need
    * the clustering shuffle at all: its writer-task count is already
    * bounded by the (coalesced) input split count, so files per dir stay
    * bounded without paying a shuffle + its AQE scheduling jobs per tiny
    * commit. Logical stats (file sizes for pruned parquet reads, row
    * estimates for literal sources) make the test free — no job, no
    * physical planning. A large delta fails the test and keeps the
    * clustered write, so behavior at 100 TB is unchanged. */
  private def fitsOneSplit(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.stats.sizeInBytes <=
      BigInt(spark.sessionState.conf.filesMaxPartitionBytes)

  /** Run `f` with session confs temporarily overridden. The overrides are
    * read at the physical planning of any action inside `f`; originals are
    * restored on exit. Concurrent writers racing the restore can at worst
    * plan under the ORIGINAL values — losing an optimization, never
    * correctness. */
  private def withScopedConf[T](pairs: (String, String)*)(f: => T): T = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  /** Forces one scan task per input FILE (openCost >= bin size closes
    * every bin after a single file) — the leaf files of a bucketed chunk
    * table are single-bucket by construction, so a rewrite planned this
    * way gets file-aligned parallelism with ~1 output file per dir and no
    * shuffle. */
  private val OneTaskPerFileConf = Seq(
    "spark.sql.files.maxPartitionBytes" -> (8L * 1024 * 1024).toString,
    "spark.sql.files.openCostInBytes" -> (8L * 1024 * 1024).toString)

  private def writeClustered(
      df: DataFrame,
      dest: Path,
      partitionBy: Seq[String],
      sortWithin: Seq[String],
      fileParallel: Boolean = false): Unit = {
    val sortCols = (partitionBy ++ sortWithin).map(col)
    def write(clustered: DataFrame): Unit = {
      val w = clustered.write.mode("overwrite")
      (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
        .parquet(dest.toString)
    }
    if (partitionBy.isEmpty) write(df)
    else if (fitsOneSplit(df)) {
      if (fileParallel)
        // sub-split REWRITE of file-backed data: plan one task per input
        // leaf file instead of coalescing to one — the serial parquet
        // encode of a whole small table was the single biggest fixed cost
        // of a mutation commit, and since every leaf file holds exactly
        // one bucket, task-per-file keeps ~1 output file per dir
        withScopedConf(OneTaskPerFileConf: _*)(
          write(df.sortWithinPartitions(sortCols: _*)))
      else
        // small NEW delta (ingest lineage, often a local/range relation
        // with many empty partitions): coalesce to ONE task — no shuffle,
        // no AQE scheduling jobs, one file per touched dir, and a
        // sub-split delta is one task's worth of work by definition
        write(df.coalesce(1).sortWithinPartitions(sortCols: _*))
    } else
      // big write: one clustering shuffle bounds output files per
      // partition dir at WriteSaltFiles; AQE byte-coalesces the
      // reduce side. Per-row compute (embedding) runs BEFORE this
      // shuffle, on the scan side, where parallelism is the input
      // split count — at 100 TB that is the whole cluster.
      write(df.repartition(
        partitionBy.map(col) :+
          pmod(xxhash64(col("id")), lit(WriteSaltFiles)): _*)
        .sortWithinPartitions(sortCols: _*))
  }

  private def writeChunks(
      vdir: Path,
      rows: DataFrame,
      buckets: Int,
      fileParallel: Boolean = false): Unit =
    writeClustered(
      rows.withColumn("__b", bucketCol(buckets)),
      new Path(vdir, "chunks"), Seq("__b"), Nil, fileParallel)

  private def writeArtifacts(
      vdir: Path,
      artifacts: Seq[IndexArtifact],
      fileParallel: Boolean = false): Unit =
    artifacts.foreach(a =>
      writeClustered(a.df, new Path(vdir, a.name), a.partitionBy,
        a.sortWithin, fileParallel))

  /** A cross-process claim survives this long before a conflicting
    * writer may treat it as a dead writer's leftover (provided the
    * version pointer never advanced to it). */
  private val StaleClaimMs = 15L * 60 * 1000

  /** Post-claim failure cleanup: any throw between [[claimVersion]] and
    * the pointer swap must delete the claimed dir — a leaked `_claim`
    * would lock the name out of writes for [[StaleClaimMs]] with no
    * overwrite recovery. Only deletes while the pointer never reached
    * `v` (strictly below): once published at v — or past it, e.g. when
    * an auto-compaction commit advanced the pointer to v+1 and THEN
    * threw inside the same try — deleting the version-v dir would break
    * readers pinned at v and the one-commit retention contract. Keeps
    * the dir when the meta state is unreadable — unsure means hands
    * off. */
  private def cleanupFailedCommit(name: String, v: Long, vdir: Path): Unit =
    scala.util.Try(readMeta(name)) match {
      case scala.util.Success(meta) if meta.forall(_.version < v) =>
        fs.delete(vdir, true)
      case _ => () // published at >= v, or meta unreadable — hands off
    }

  /** Claim version `v` of a library by atomically creating its
    * `_claim` marker (create with overwrite=false — the filesystem's
    * compare-and-set). Two writers racing from the same base version
    * both compute the same v; exactly one claim succeeds and the loser
    * fails HERE, before writing a byte of data, instead of silently
    * colliding in the version dir or last-wins-clobbering the meta
    * pointer. Same-process writers never even race: mutations
    * serialize on a per-library JVM lock (the reference's per-library
    * lock, library.py:59/dependencies.py:28-32, kept for writers —
    * readers still need no lock thanks to version immutability).
    *
    * A writer that died mid-commit leaves an orphan claim; it is
    * reclaimed (dir deleted, claim retried) once it is older than
    * [[StaleClaimMs]] AND the pointer never advanced to its version —
    * a live writer's claim is either young or already committed. */
  private def claimVersion(name: String, vdir: Path): Unit = {
    val claim = new Path(vdir, "_claim")
    def tryClaim(): Boolean =
      try { fs.create(claim, false).close(); true }
      catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
        case _: java.io.IOException if fs.exists(claim)          => false
      }
    if (tryClaim()) return
    val vNum = vdir.getName.stripPrefix("v").toLong
    val stale =
      try {
        val age =
          System.currentTimeMillis() - fs.getFileStatus(claim).getModificationTime
        age > StaleClaimMs && !readMeta(name).exists(_.version >= vNum)
      } catch { case _: java.io.FileNotFoundException => true }
    if (stale) {
      log.warn(s"library '$name': reclaiming stale uncommitted version " +
        s"${vdir.getName} left by a dead writer")
      fs.delete(vdir, true)
      if (tryClaim()) return
    }
    throw new java.util.ConcurrentModificationException(
      s"library '$name': version ${vdir.getName} is already claimed by " +
        "another writer — re-read the library and retry the mutation")
  }

  /** Swap the pointer, then GC: a version dir survives while the current
    * or previous version's manifest OR artifact list references it (or
    * IS one of those two versions — in-flight readers of v-1 stay
    * whole).
    *
    * LOAD-BEARING RETENTION CONTRACT: the previous version's refs are
    * not merely a courtesy — concurrent version-pinned readers depend on
    * them. SparkEntry's M9 check (the `sideDigest` Future in
    * q_crud_pipeline) scans the PRE-rebuild index concurrently with
    * rebuildIndex and is only race-free because this GC keeps every file
    * the previous version references until the NEXT commit. Narrowing
    * retention to current-only (or letting an extra commit slip between
    * a reader's plan and its execution) makes such pinned scans read
    * deleted files intermittently. If you change the `prevRefs` term
    * below, update that call site — single-version-pinned readers must
    * then complete before the next commit is allowed to start. */
  private def finishCommit(
      m: LibraryMeta, v: Long, mf: Map[Int, Seq[String]],
      extraKeep: Set[String] = Set.empty): LibraryMeta = {
    val updated = m.copy(version = v, updatedAt = now())
    writeMeta(updated)
    val prevRefs =
      if (v >= 1)
        readManifest(m.name, v - 1).values.flatten.toSet ++
          readArtifactRefs(m.name, v - 1).values.flatten.toSet
      else Set.empty[String]
    val keep = mf.values.flatten.toSet ++
      readArtifactRefs(m.name, v).values.flatten.toSet ++ prevRefs ++
      extraKeep +
      versionDir(m.name, v).getName + versionDir(m.name, v - 1).getName
    fs.listStatus(libDir(m.name))
      .filter(_.isDirectory)
      .map(_.getPath)
      .filter { p =>
        val n = p.getName
        // never touch a FUTURE version dir: cross-process, another
        // writer may have already claimed v+1 off this commit's pointer
        // and be mid-write — GC only reaps strictly-older history
        val isOld = n.startsWith("v") &&
          scala.util.Try(n.stripPrefix("v").toLong).toOption.exists(_ < v)
        isOld && !keep.contains(n)
      }
      .foreach(fs.delete(_, true))
    // the driver-side twin of the on-disk GC above: drop superseded
    // versions' graphs from the hnsw cache
    evictStaleHnsw(m.name, v)
    syncAnnProbeRegistration(updated)
    updated
  }

  /** Keep [[graft.plans.AnnProbeRule]]'s registry in step with the
    * catalog lifecycle: every commit (re-)registers the library's
    * persisted ANN artifact under the library's NAME as token, pinned to
    * the just-committed version — a catalog-built lsh/ivf library is
    * probe-rewritable with no explicit register call, and a mutation
    * atomically moves the token to the new version's artifacts (the old
    * pin can never serve a stale candidate set). Indexer families the
    * rule cannot probe (flat, hnsw, ivfpq) DEREGISTER the name, so an
    * indexer change never leaves a foreign probe behind. Registration
    * builds closures only — no Spark job runs at commit time; the IVF
    * centroids (a bounded collect) load lazily on the first probe.
    *
    * `allowDeregister = false` is the READ-path mode (startup recovery
    * via listLibraries): register what is probeable into an unbound or
    * RECOVERY-owned token (a re-listing must track version bumps made
    * by another process, or its pin would rot to a GC'd artifact), but
    * never replace a mutation-time or manual registration and never
    * remove a token — only mutations of a library may retire its name. */
  private def syncAnnProbeRegistration(
      m: LibraryMeta,
      allowDeregister: Boolean = true): Unit = {
    import graft.plans.AnnProbeRule
    def art(artifactName: String): DataFrame =
      artifactAt(m.name, artifactName, m.version).getOrElse(
        throw new IllegalStateException(
          s"library '${m.name}' v${m.version}: $artifactName artifact missing"))
    def bind(probe: => AnnProbeRule.ArtifactProbe): Unit =
      if (allowDeregister) AnnProbeRule.register(m.name, probe)
      // recovery-origin binding: refreshes an earlier recovery's pin
      // (so a re-listing after a cross-process version bump re-pins to
      // the CURRENT version instead of a GC-doomed one) but never
      // replaces a mutation-time or manual registration
      else AnnProbeRule.registerRecovered(m.name, probe)
    m.indexer match {
      case LshIndexer =>
        bind(AnnProbeRule.lshArtifact(
          () => art("index"), lshParams(m.dim),
          idCol = "id", embCol = "embedding"))
      case IvfIndexer =>
        bind(AnnProbeRule.ArtifactProbe("ivf", "id", m.dim, qv => {
          // shared per-(name, version) quantizer cache — the rule's
          // probe and the catalog search path collect centroids once
          // between them, and version eviction is one mechanism
          val (c, _) = quantizersFor(m.name, m.version, art("centroids"), None)
          val probed = IvfIndex.probeCells(qv, c, ivfParams.nProbe).map(_.toInt)
          art("index").where(col("cell").isin(probed: _*)).select("id")
        }, embCol = "embedding"))
      case _ =>
        if (allowDeregister) AnnProbeRule.deregister(m.name)
    }
  }

  /** FULL commit (createLibrary / rebuildIndex): write every row, point
    * every bucket at this version — i.e. compaction of whatever delta
    * history the manifest had accumulated. `artifactsFor` receives the
    * WRITTEN chunks (read back from the new version's parquet): a full
    * index build re-reads the materialized table instead of re-executing
    * the whole normalize/embed lineage a second time —
    * write-once-read-back is the only shape that survives 100 TB ingest. */
  private def commitFull(
      m: LibraryMeta,
      chunksDf: DataFrame,
      artifactsFor: DataFrame => Seq[IndexArtifact],
      extraKeep: Set[String] = Set.empty): LibraryMeta = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val v = m.version + 1
    val vdir = versionDir(m.name, v)
    val vname = vdir.getName
    claimVersion(m.name, vdir)
    try commitFullClaimed(m, chunksDf, artifactsFor, extraKeep, v, vdir, vname)
    catch {
      case e: Throwable => cleanupFailedCommit(m.name, v, vdir); throw e
    }
  }

  private def commitFullClaimed(
      m: LibraryMeta,
      chunksDf: DataFrame,
      artifactsFor: DataFrame => Seq[IndexArtifact],
      extraKeep: Set[String],
      v: Long, vdir: Path, vname: String): LibraryMeta = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val arts =
      if (fitsOneSplit(chunksDf)) {
        // Small ingest: cache the normalized delta (embedding runs ONCE,
        // in memory) and write chunks + index artifacts CONCURRENTLY from
        // the cache — the read-back path below would serialize the two
        // writes behind each other. At scale caching the corpus is not an
        // option and read-back is the only shape that avoids re-executing
        // the embed lineage, so this stays gated on one-split stats.
        val cached = chunksDf.persist()
        try {
          val built = artifactsFor(cached)
          val chunkWrite = Future(writeChunks(vdir, cached, m.buckets))
          val artifactWrite = Future(writeArtifacts(vdir, built))
          val results = Seq(chunkWrite, artifactWrite)
            .map(f => Await.ready(f, Duration.Inf).value.get)
          results.collectFirst { case scala.util.Failure(e) => e }.foreach {
            e => fs.delete(vdir, true); throw e
          }
          built
        } finally cached.unpersist()
      } else {
        writeChunks(vdir, chunksDf, m.buckets)
        val built = artifactsFor(
          readChunksAt(m.name,
            presentBuckets(vdir).map(b => b -> Seq(vname)).toMap))
        writeArtifacts(vdir, built)
        built
      }
    val mf = presentBuckets(vdir).map(b => b -> Seq(vname)).toMap
    writeManifest(vdir, mf)
    writeArtifactRefs(vdir, arts.map(a => a.name -> Seq(vname)).toMap)
    finishCommit(m, v, mf, extraKeep)
  }

  /** What a delta commit does to the index artifacts — always O(delta)
    * bytes, never a full index rewrite (that's what [[commitFull]] is
    * for). */
  private sealed trait ArtifactOp
  /** Mutation doesn't touch embeddings: every artifact carries forward
    * BY REFERENCE — zero index bytes read or written. */
  private case object CarryArtifacts extends ArtifactOp
  /** Append `newRows` to the index part list and/or tombstone
    * `deleteIds`. A tombstone written in the same commit as an append
    * does not cancel the appended rows (updateChunk's
    * delete-old+add-new), see [[artifact]]. */
  private case class PatchIndex(
      newRows: Option[DataFrame],
      deleteIds: Option[Tombstone]) extends ArtifactOp

  /** How a delete's ids reach the tombstone part: driver-held id lists
    * are written inline (no Spark job); predicate deletes too large to
    * hold on the driver stay a distributed parquet write. */
  private sealed trait Tombstone
  private case class InlineIds(ids: Seq[String]) extends Tombstone
  private case class IdsFrame(df: DataFrame) extends Tombstone
  /** Ids that only become known once the chunk write's observed metrics
    * resolve (the single-pass mutation path) — evaluated at tombstone
    * write time, which is after that job completes. */
  private case class LazyIds(ids: () => Seq[String]) extends Tombstone

  /** Control-flow signal: the observed single-pass mutation discovered,
    * post-write, that no row matched — the claimed version dir is
    * discarded and the mutation is a published no-op. */
  private object NoopMutation extends RuntimeException("noop mutation") {
    override def fillInStackTrace(): Throwable = this
  }

  /** DELTA commit: write only `deltaRows`.
    *  - `replaceBuckets = Some(A)`: the delta IS the new content of the
    *    buckets in A — they repoint to this version (a bucket emptied by
    *    a delete drops out of the manifest); every other bucket carries.
    *  - `replaceBuckets = None` (append): each bucket the delta touched
    *    gains this version at the end of its dir list; nothing old is
    *    rewritten or even read. */
  private def commitDelta(
      m: LibraryMeta,
      deltaRows: DataFrame,
      replaceBuckets: Option[Set[Int]],
      op: ArtifactOp,
      postWrite: () => Unit = () => (),
      metadataOnly: Boolean = false): LibraryMeta = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val v = m.version + 1
    val vdir = versionDir(m.name, v)
    val vname = vdir.getName
    claimVersion(m.name, vdir)
    try {
    val oldRefs = readArtifactRefs(m.name, m.version)
    val patch = op match {
      case CarryArtifacts => None
      case PatchIndex(_, _) if !oldRefs.get("index").exists(_.nonEmpty) =>
        None // flat library: nothing to patch or tombstone
      case PatchIndex(newRows, deleteIds) => Some((newRows, deleteIds))
    }
    // The chunk-delta write and the index-artifact writes have
    // independent lineages (index rows are computed from the delta
    // expression, never read back from the written chunks), so they run
    // CONCURRENTLY: per-commit latency is max(write, write) instead of
    // the sum — the dominant cost of a small commit is per-job fixed
    // overhead, not bytes. An abort (postWrite throw, e.g. the
    // updateChunk 404 riding the chunk write's observed metric) deletes
    // the whole claimed dir, artifacts included — nothing is published
    // until finishCommit swaps the pointer. Both futures are awaited to
    // completion BEFORE any cleanup so a failed write never races a
    // still-running sibling against the dir delete.
    val chunkWrite = Future {
      // bucket REWRITES (replaceBuckets set) re-encode file-backed data —
      // file-aligned parallel write; pure appends are new-data lineages
      // and keep the one-task one-file-per-dir shape
      writeChunks(vdir, deltaRows, m.buckets,
        fileParallel = replaceBuckets.isDefined)
      // abort hook: runs with the delta written but NOTHING published
      postWrite()
      // tombstones ride this thread AFTER the abort hook: a LazyIds
      // tombstone reads the chunk write's observed metrics, which resolve
      // with that job — evaluating it on the sibling thread could block
      // forever if this write failed before the metrics resolved
      patch.foreach { case (_, deleteIds) =>
        def writeFrame(ids: DataFrame): Unit =
          ids.select("id").write.mode("overwrite")
            .parquet(new Path(vdir, "index_deletes").toString)
        deleteIds.foreach {
          case InlineIds(ids) => writeInlineTombstone(vdir, ids)
          case LazyIds(ids) =>
            // a metrics-resolved id set can exceed the inline bound the
            // read side was sized for (a predicate delete matching most
            // of a one-split library) — past the cap it goes to a
            // parquet tombstone part like any big delete
            val got = ids()
            if (got.size <= MaxInlineTombstone) writeInlineTombstone(vdir, got)
            else {
              import spark.implicits._
              writeFrame(got.toDF("id").coalesce(1))
            }
          case IdsFrame(ids) => writeFrame(ids)
        }
      }
    }
    val artifactWrite = Future {
      patch.foreach { case (newRows, _) =>
        newRows.foreach(rows =>
          writeArtifacts(vdir, Seq(IndexArtifact(
            "index", rows,
            artifactPartitioning(m.indexer, "index"),
            artifactSortWithin(m.indexer, "index")))))
      }
    }
    val results = Seq(chunkWrite, artifactWrite)
      .map(f => Await.ready(f, Duration.Inf).value.get)
    results.collectFirst { case scala.util.Failure(e) => e }.foreach { e =>
      fs.delete(vdir, true)
      throw e
    }
    val present = presentBuckets(vdir)
    val old = readManifest(m.name, m.version)
    val mf = replaceBuckets match {
      case Some(repl) =>
        (old -- repl) ++ present.map(b => b -> Seq(vname))
      case None =>
        old ++ present.map(b => b -> (old.getOrElse(b, Seq.empty) :+ vname))
    }
    writeManifest(vdir, mf)
    val carried = patch match {
      case None => oldRefs
      case Some((newRows, deleteIds)) =>
        var r = oldRefs
        if (newRows.isDefined)
          r = r.updated("index", r("index") :+ vname)
        if (deleteIds.isDefined)
          r = r.updated(
            "index_deletes", r.getOrElse("index_deletes", Seq.empty) :+ vname)
        r
    }
    // a delta invalidates the persisted DRIVER hnsw graph (a
    // whole-corpus structure, not an O(delta)-patchable table): drop its
    // refs so the next cold read rebuilds lazily (bounded by
    // hnswMaxRows); rebuildIndex/compactLibrary write a fresh one.
    // EXCEPTION: a caller-certified metadata-only commit changes no
    // (id, embedding) pair — every graph is a pure function of those, so
    // it carries forward and the next search pays neither an artifact
    // re-read nor the O(n log n) rebuild. (op == CarryArtifacts alone
    // is NOT that certificate: the HNSW add/update fallbacks also use
    // it while rows genuinely change.) The PARTITIONED over-cap graphs
    // (hnsw_parts) are different: partition membership is data-derived
    // and each partition's graph is a pure function of ITS OWN id set,
    // so a delta is an O(touched-partitions) PATCH, not a drop — see
    // [[patchHnswPartsRefs]].
    val refs =
      if (m.indexer == HnswIndexer && !metadataOnly)
        patchHnswPartsRefs(
          m, vdir, vname, mf, carried - HnswGraphArtifact - HnswMetaArtifact)
      else carried
    writeArtifactRefs(vdir, refs)
    val committed = finishCommit(m, v, mf)
    maybeAutoCompact(committed, mf, refs)
    } catch {
      case e: Throwable => cleanupFailedCommit(m.name, v, vdir); throw e
    }
  }

  /** Auto-compaction policy: a delta commit whose read amplification —
    * the largest part-list any chunk bucket or index artifact has
    * accumulated — exceeds `autoCompactRefs` triggers a full
    * [[compactLibrary]] in the same lock scope, folding the lists back
    * to one referenced version. Between triggers every mutation stays
    * O(delta); the threshold bounds the read side's per-scan part count
    * (and the per-read anti-join count from deletion vectors) at any
    * commit rate, the RocksDB/Delta-style amortization: total write
    * cost stays O(data · log-ish) while reads never see more than the
    * threshold's worth of parts. 0 disables (callers that own their
    * compaction schedule). */
  private def maybeAutoCompact(
      m: LibraryMeta,
      mf: Map[Int, Seq[String]],
      refs: Map[String, Seq[String]]): LibraryMeta = {
    val amp = (mf.values.map(_.size) ++ refs.values.map(_.size))
      .maxOption.getOrElse(0)
    if (autoCompactRefs > 0 && amp > autoCompactRefs) {
      log.info(
        s"auto-compacting '${m.name}': read amplification $amp > $autoCompactRefs")
      // This mutation call now performs a SECOND commit, which would
      // burn the one-later-commit file-retention allowance finishCommit
      // documents for in-flight readers of the PRE-delta version. Keep
      // that generation's referenced files (and its version dir) alive
      // through the compaction commit too, so one mutation CALL still
      // honors the one-commit contract regardless of auto-compaction.
      val prev = m.version - 1
      val extraKeep: Set[String] =
        if (prev < 0) Set.empty
        else readManifest(m.name, prev).values.flatten.toSet ++
          readArtifactRefs(m.name, prev).values.flatten.toSet +
          versionDir(m.name, prev).getName
      compactLibrary(m.name, extraKeep)
    } else m
  }

  private def buildIndex(m: LibraryMeta, chunksDf: DataFrame): Seq[IndexArtifact] =
    m.indexer match {
      case LshIndexer =>
        // clustered by table_idx, rows sorted by sig inside each dir
        // (via writeClustered) → the probe's sig-equality pushdown skips
        // row groups, not just partitions
        val sig =
          LshIndex.signatureTable(chunksDf, lshParams(m.dim), "id", "embedding")
        Seq(IndexArtifact("index", sig, Seq("table_idx"), Seq("sig")))
      case IvfIndexer =>
        val cents = IvfIndex.centroids(chunksDf, ivfParams, "id", "embedding")
        Seq(
          IndexArtifact(
            "index",
            IvfIndex.assignmentsForWrite(chunksDf, cents, "id", "embedding"),
            Seq("cell")),
          IndexArtifact(
            "centroids", IvfIndex.centroidsDfFromVecs(spark, cents), Nil))
      case IvfPqIndexer =>
        // IVF-PQ: coarse centroids and PQ codebook share ONE dense
        // sample (the nCells lowest-id vectors); the codes table —
        // m small ints + a cell per chunk, cell-partitioned — is the
        // persisted index, 4 bytes/vector at scale. Both quantizers are
        // build-once artifacts: delta commits encode against them by
        // reference, rebuildIndex re-derives them.
        val sample = IvfIndex.centroids(chunksDf, ivfParams, "id", "embedding")
        val cb = PqIndex.codebookFromSample(sample, pqParams)
        Seq(
          IndexArtifact(
            "index",
            PqIndex.codesForWrite(chunksDf, cb, sample, pqParams, "id", "embedding"),
            Seq("cell")),
          IndexArtifact(
            "centroids", IvfIndex.centroidsDfFromVecs(spark, sample), Nil),
          IndexArtifact("codebook", PqIndex.codebookDf(spark, cb), Nil))
      case HnswIndexer =>
        // K3: the graph itself is a persisted artifact (hnsw.py:372-401
        // save_to_dict/load_from_dict parity) — nodes + adjacency as
        // parquet rows, entry point + next insertion ordinal as a one-row
        // meta table. Both DataFrames are driver-local relations at write
        // time (the build already collected the corpus under
        // [[hnswMaxRows]]), so persisting schedules no extra scan; a cold
        // catalog then pays one bounded artifact read instead of the
        // O(n log n) graph rebuild. Over the driver-graph cap the
        // PARTITIONED per-partition graphs are persisted instead
        // (hnsw_parts): the over-cap redirect then RESTORES them per
        // search — build-once/probe-many, the same economics as the LSH
        // signature table — rather than paying the full per-partition
        // insert sequence on every query (measured at x100 as ~21 s of
        // rebuild per search).
        buildHnswGraph(chunksDf) match {
          case None =>
            Seq(IndexArtifact(
              HnswPartsArtifact,
              // the explicit part-keyed repartition between the build
              // and the write is load-bearing: writeClustered's
              // small-artifact path coalesce(1)s, and a NARROW coalesce
              // fuses into the flatMapGroups stage — all partition
              // graphs then build SERIALLY in one task (measured at
              // x100: 571 s create, ~32 x the single-graph build). The
              // shuffle boundary keeps the builds at full parallelism
              // and leaves the cheap write to whatever task count the
              // writer picks.
              HnswIndex.partitionedGraphRowsKeyed(
                chunksDf, HnswPartsCount, "id", "embedding")
                .repartition(HnswPartsCount, col("part")),
              Seq("part")))
          case Some((idx, ids)) =>
            import spark.implicits._
            val graphDf = idx.exportNodes.map { case (ord, vec, lvl, nbrs) =>
              (ord, ids(ord.toInt), lvl, vec.toSeq, nbrs.map(_.toSeq).toSeq)
            }.toDF("ord", "id", "level", "vec", "nbrs")
            val metaDf =
              Seq((idx.entry, idx.nextOrdinal)).toDF("entry", "next_ordinal")
            Seq(
              IndexArtifact(HnswGraphArtifact, graphDf, Nil),
              IndexArtifact(HnswMetaArtifact, metaDf, Nil))
        }
      case _ => Seq.empty // flat needs no index table
    }

  /** Ingest shape normalization (chunk.py:25-42,55-71): trimmed
    * non-empty text, deduped tags (P6, array_distinct), uuid() for
    * missing ids (§2.8), current_timestamp for missing created_at, a
    * null-filled embedding column when the input has none. Cheap,
    * per-row, no hashing — safe to run on the map side of the
    * clustering shuffle. */
  private def normalizeShape(df: DataFrame): DataFrame = {
    val emptyMeta = struct(
      chunkMetadataType.fields
        .map(f => lit(null).cast(f.dataType).as(f.name))
        .toIndexedSeq: _*)
    val withCols = Seq("id", "metadata", "embedding")
      .foldLeft(df) {
        case (d, "id") if !d.columns.contains("id") =>
          d.withColumn("id", expr("uuid()"))
        case (d, "metadata") if !d.columns.contains("metadata") =>
          d.withColumn("metadata", emptyMeta)
        case (d, "embedding") if !d.columns.contains("embedding") =>
          d.withColumn("embedding",
            lit(null).cast(chunkSchema("embedding").dataType))
        case (d, _) => d
      }
    withCols
      .withColumn("text", trim(col("text")))
      .where(length(col("text")) > 0)
      .withColumn("id", coalesce(col("id"), expr("uuid()")))
      .withColumn("metadata",
        coalesce(col("metadata"), emptyMeta)
          .withField("tags", array_distinct(col("metadata.tags")))
          .withField("created_at",
            coalesce(col("metadata.created_at"), current_timestamp())))
      // Field-validation parity (chunk.py:25-42): page must be
      // non-negative, tag strings must be non-blank. Runs distributed on
      // the scan side; a bad row fails the ingest job with a named error
      // instead of persisting corrupt metadata.
      .withColumn("metadata",
        when(col("metadata.page") < 0,
          raise_error(concat(
            lit("graft ingest validation: page must be non-negative, got "),
            col("metadata.page"))).cast(chunkMetadataType))
          .when(
            org.apache.spark.sql.functions
              .exists(col("metadata.tags"), t => length(trim(t)) === 0),
            raise_error(
              lit("graft ingest validation: tags cannot be empty strings"))
              .cast(chunkMetadataType))
          .otherwise(col("metadata")))
  }

  /** Ingest-parity guard for caller-supplied metadata on UPDATE paths:
    * the same page >= 0 / non-blank-tag validation and tag dedup
    * [[normalizeShape]] enforces at ingest — an update must never be
    * able to persist metadata that ingest would reject loudly
    * (chunk.py:25-42 applies to updates too: the reference re-validates
    * through the same Pydantic model). Idempotent, so the batched and
    * sequential mutation paths may both apply it. */
  private def validatedMetadata(mcol: Column): Column = {
    val cast = mcol.cast(chunkMetadataType)
    val deduped = cast.withField("tags", array_distinct(cast.getField("tags")))
    when(deduped.getField("page") < 0,
      raise_error(concat(
        lit("graft ingest validation: page must be non-negative, got "),
        deduped.getField("page"))).cast(chunkMetadataType))
      .when(
        org.apache.spark.sql.functions
          .exists(deduped.getField("tags"), t => length(trim(t)) === 0),
        raise_error(
          lit("graft ingest validation: tags cannot be empty strings"))
          .cast(chunkMetadataType))
      .otherwise(deduped)
  }

  /** Embedding-dimension validation at ingest (chunk.py:63-71 — 1-D,
    * non-empty — and hnsw.py:553-563 — dim consistency on load). A
    * caller-supplied embedding of the wrong length would otherwise NULL
    * every distance downstream; rejecting it here keeps every persisted
    * embedding exactly `dim`-wide. Null embeddings pass through (the embed
    * stage fills them). Codegen'd per-row check, no extra job. */
  private def validateEmbeddingDim(df: DataFrame, dim: Int): DataFrame =
    if (!df.columns.contains("embedding")) df
    else df.withColumn("embedding",
      when(col("embedding").isNull, col("embedding"))
        .when(size(col("embedding")) === lit(dim), col("embedding"))
        .otherwise(raise_error(concat(
          lit(s"graft ingest validation: embedding dimension mismatch, expected $dim got "),
          size(col("embedding")))).cast(chunkSchema("embedding").dataType)))

  /** The embed step (S6's dedup-before-embed path): fill embeddings for
    * rows that lack one, pass the rest through, preserving every input
    * column (including write-side helpers like `__b`). When the caller
    * knows the input carried no embedding column at all (the common
    * ingest shape), a single branch embeds everything — the
    * split-and-union would scan the lineage twice for an always-empty
    * branch. */
  private def embedStage(
      dim: Int,
      model: Embedder.Model,
      hadEmbedding: Boolean)(base: DataFrame): DataFrame = {
    val cols = base.columns.toIndexedSeq
    if (!hadEmbedding)
      Embedder
        .withEmbedding(base.drop("embedding"), dim = dim, model = model)
        .select(cols.map(col): _*)
    else
      base
        .where(col("embedding").isNotNull)
        .unionByName(
          Embedder
            .withEmbedding(base.where(col("embedding").isNull).drop("embedding"),
              dim = dim, model = model)
            .select(cols.map(col): _*))
  }

  /** Full ingest normalization: shape + embed, all on the scan side of
    * any downstream shuffle. Embedding parallelism is therefore the
    * input split count — at 100 TB that is the whole cluster; for a tiny
    * delta it is one task whose cost is proportional to the delta. */
  private def normalize(
      df: DataFrame,
      dim: Int,
      model: Embedder.Model): DataFrame =
    embedStage(dim, model, df.columns.contains("embedding"))(
      validateEmbeddingDim(normalizeShape(df), dim))
      .select(chunkSchema.fieldNames.map(col).toIndexedSeq: _*)

  /** [[normalize]] for MULTI-CONSUMER deltas: a delta commit evaluates
    * its lineage in TWO jobs (chunk write + index rows), and ids this
    * normalization MINTED (`uuid()` for rows arriving without one) are
    * non-deterministic per evaluation — unpinned, the index rows would
    * reference phantom ids that differ from the written chunks and the
    * rows would be silently unsearchable through every probe. When the
    * input could mint (no id column, or a nullable one the coalesce
    * might fill), the normalized delta is materialized ONCE
    * (localCheckpoint — deltas are ingest-batch-sized by construction;
    * full loads go through commitFull, which persists or re-reads the
    * written chunks for the same reason). */
  private def normalizeStable(
      df: DataFrame,
      dim: Int,
      model: Embedder.Model): DataFrame = {
    val out = normalize(df, dim, model)
    val mayMint =
      !df.columns.contains("id") || df.schema("id").nullable
    if (mayMint) out.localCheckpoint(true) else out
  }

  /** M1: create a library from a chunk DataFrame (missing columns are
    * filled by [[normalize]]; embeddings are computed when absent). */
  def createLibrary(
      name: String,
      indexer: IndexerType = FlatIndexer,
      chunksDf: DataFrame,
      dim: Int = Embedder.Dim,
      overwrite: Boolean = false,
      embedder: String = "md5",
      numBuckets: Int = LibraryCatalog.AutoBuckets): LibraryMeta = withWriteLock(name) {
    validateName(name)
    require(numBuckets == LibraryCatalog.AutoBuckets || numBuckets > 0,
      s"numBuckets must be positive (or AutoBuckets): $numBuckets")
    if (exists(name)) {
      if (!overwrite)
        throw new IllegalStateException(s"library already exists: $name")
      deleteLibrary(name)
    }
    fs.mkdirs(libDir(name))
    val m0 = LibraryMeta(name, indexer, dim, version = -1L, now(), now(),
      embedder = embedder, buckets = 1)
    val normalized = normalize(chunksDf, dim, modelOf(m0))
    val buckets =
      if (numBuckets == LibraryCatalog.AutoBuckets) autoBucketCount(normalized)
      else numBuckets
    val m = m0.copy(buckets = buckets)
    commitFull(m, normalized, written => buildIndex(m, written))
  }

  /** Resolve [[LibraryCatalog.AutoBuckets]]: ~one bucket per
    * [[AutoBucketTargetBytes]] of optimizer-estimated input, clamped to
    * [1, [[MaxAutoBuckets]]]. A KB-scale library gets ONE bucket — at
    * that size per-file create/commit overhead IS the cost of a commit,
    * and 8 near-empty dirs per version bought nothing — while a 100 TB
    * ingest gets tens of thousands, because the bucket is the
    * file-pruning and rewrite granularity every later mutation pays.
    *
    * Stats-less leaf plans (LogicalRDD from `createDataFrame(rdd, …)`,
    * some V2 sources) report `spark.sql.defaultSizeInBytes` —
    * Long.MaxValue by default — as their size; taking that at face value
    * would lock an arbitrarily small library to the [[MaxAutoBuckets]]
    * clamp forever (bucket count is immutable for the library's
    * lifetime) and pay a 65536-leaf-dir explosion on every commit. Any
    * estimate at or above the sentinel is unusable, so fall back to
    * [[FallbackBuckets]] — the pre-auto fixed default, safe at any size
    * a caller would reasonably route through an un-stats'd source. */
  private def autoBucketCount(normalized: DataFrame): Int = {
    val bytes = normalized.queryExecution.optimizedPlan.stats.sizeInBytes
    if (bytes >= BigInt(spark.sessionState.conf.defaultSizeInBytes))
      FallbackBuckets
    else
      ((bytes + AutoBucketTargetBytes - 1) / AutoBucketTargetBytes)
        .min(BigInt(MaxAutoBuckets)).max(BigInt(1)).toInt
  }

  /** Index rows for just `added`, computed against the CURRENT index
    * state (LSH: signatures; IVF: assignments against the FIXED
    * persisted centroids — standard IVF practice, rebuildIndex
    * re-derives them). None when the library has no index to extend —
    * callers fall back to a full [[buildIndex]]. */
  private def incrementalIndexRows(
      m: LibraryMeta,
      name: String,
      added: DataFrame): Option[DataFrame] =
    m.indexer match {
      case LshIndexer =>
        // refs existence check only — the patch never reads the old index
        if (readArtifactRefs(name, m.version).get("index").exists(_.nonEmpty))
          Some(LshIndex.signatureTable(added, lshParams(m.dim), "id", "embedding"))
        else None
      case IvfIndexer =>
        centroidsTable(name).map(c =>
          IvfIndex.assignmentsForWrite(
            added, IvfIndex.centroidsOf(c), "id", "embedding"))
      case IvfPqIndexer =>
        // encode only the added rows against the FIXED persisted
        // quantizers (codebook + coarse centroids) — O(delta), standard
        // IVF-PQ practice; rebuildIndex re-derives both
        for {
          c <- centroidsTable(name)
          cbT <- codebookTable(name)
        } yield PqIndex.codesForWrite(
          added, PqIndex.codebookOf(cbT, pqParams),
          IvfIndex.centroidsOf(c), pqParams, "id", "embedding")
      case _ => None
    }

  /** Manifest-pruned read: only the leaf dirs of `buckets` are listed
    * and scanned — a bucket-scoped mutation touches |buckets|/NumBuckets
    * of the data at the FILE level, not via a post-scan filter. */
  private def chunksInBuckets(
      name: String, m: LibraryMeta, buckets: Set[Int]): DataFrame =
    readChunksAt(name,
      readManifest(name, m.version).filter { case (b, _) => buckets(b) })

  private def idsDf(ids: Seq[String]): DataFrame =
    spark
      .createDataset(ids)(org.apache.spark.sql.Encoders.STRING)
      .select(col("value").as("id"))

  /** Largest id list the driver will hold/write inline (~a few hundred
    * KB of text; also the reconciliation broadcast stays trivially
    * small). Beyond it, tombstones take the distributed parquet path. */
  private val MaxInlineTombstone = 10000

  private def tombstoneFor(ids: Seq[String]): Tombstone =
    if (ids.size <= MaxInlineTombstone) InlineIds(ids) else IdsFrame(idsDf(ids))

  /** One column-pruned job that TRIES to pull a predicate's whole match
    * set — (id, bucket) pairs — to the driver under [[MaxInlineTombstone]].
    * `Some(hits)` is the COMPLETE match set (possibly empty: the caller
    * can skip the commit entirely); `None` means the cap tripped and the
    * caller must take its distributed path. A sub-split probe coalesces
    * to one task so the limit-collect is a single job (the progressive
    * CollectLimit would otherwise scale up through 1-, 4-, 16-partition
    * jobs); a large table keeps the distributed progressive scan. */
  private def probeMatches(
      all: DataFrame,
      matches: Column,
      buckets: Int): Option[Array[(String, Int)]] = {
    val probe = all.where(matches)
      .select(col("id"), bucketCol(buckets).as("__b"))
    val hits =
      (if (fitsOneSplit(probe)) probe.coalesce(1) else probe)
        .limit(MaxInlineTombstone + 1)
        .collect()
        .map(r => (r.getString(0), r.getInt(1)))
    if (hits.length <= MaxInlineTombstone) Some(hits) else None
  }

  /** M2/M3: append chunks — a PURE APPEND commit: only the new rows are
    * written (no old bucket is rewritten or read); the index is
    * maintained INCREMENTALLY (indexer.add, lsh.py:84-112): only the new
    * rows' LSH signatures / IVF cell assignments are computed and only
    * they are written (a new part, never a rewrite). */
  def addChunks(name: String, newChunks: DataFrame): LibraryMeta = withWriteLock(name) {
    val m = requireMeta(name)
    val added = normalizeStable(newChunks, m.dim, modelOf(m))
    incrementalIndexRows(m, name, added) match {
      case Some(newRows) =>
        commitDelta(m, added, None, PatchIndex(Some(newRows), None))
      case None if m.indexer == LshIndexer || m.indexer == IvfIndexer ||
          m.indexer == IvfPqIndexer =>
        // index table missing (shouldn't happen post-create): full rebuild
        commitFull(m, chunks(name).unionByName(added), w => buildIndex(m, w))
      case None =>
        commitDelta(m, added, None, CarryArtifacts)
    }
  }

  /** M5: delete chunks by id — only the buckets holding the ids are
    * read and rewritten (driver-computed bucket set, no scan needed);
    * the index drops the ids via a TOMBSTONE part (indexer.delete,
    * lsh.py:114-145 — O(ids) bytes, no index rewrite); IVF centroids
    * are a quantizer, not data, and carry forward by reference. */
  def deleteChunks(
      name: String,
      ids: Seq[String],
      strict: Boolean = false): LibraryMeta = withWriteLock(name) {
    val m = requireMeta(name)
    val affected = ids.map(bucketOfId(_, m.buckets)).toSet
    val bucket = chunksInBuckets(name, m, affected)
    if (!strict)
      commitDelta(m, bucket.where(!col("id").isin(ids: _*)), Some(affected),
        PatchIndex(None, Some(tombstoneFor(ids))))
    else {
      // 404 parity (chunk_service.py:193-217): every id must exist. The
      // match count rides the rewrite as an observed metric — no
      // existence-scan job — and a miss aborts the commit unpublished.
      val obs = org.apache.spark.sql.Observation()
      val distinctIds = ids.distinct
      val survivors = bucket
        .observe(obs,
          sum(when(col("id").isin(distinctIds: _*), 1L).otherwise(0L))
            .as("matched"))
        .where(!col("id").isin(ids: _*))
      commitDelta(m, survivors, Some(affected),
        PatchIndex(None, Some(tombstoneFor(ids))),
        postWrite = () => {
          val n = obs.get("matched").asInstanceOf[Long]
          if (n < distinctIds.size)
            throw new NoSuchElementException(
              s"chunk not found: ${distinctIds.size - n} of " +
                s"${distinctIds.size} ids missing")
        })
    }
  }

  /** M5 at scale: delete by predicate (ids arrive as a predicate, not a
    * driver-side list). One small job finds the affected buckets; only
    * those are rewritten. Rows where the predicate is NULL are KEPT
    * (delete removes rows the predicate is TRUE for — the SQL DELETE
    * semantics). Surviving rows' index entries are unchanged: semi-join
    * the index against the survivors' ids instead of recomputing a
    * single signature (indexer.delete, lsh.py:114-145). */
  def deleteChunksWhere(name: String, pred: Column): LibraryMeta = withWriteLock(name) {
    val m = requireMeta(name)
    val all = chunks(name)
    val matches = coalesce(pred, lit(false))
    // small-library regime: one observed rewrite pass, no probe job at
    // all (applyBatch's single-pass arm — same semantics, fewer jobs)
    if (fitsOneSplit(all))
      applyBatch(name, Seq(LibraryCatalog.DeleteChunksWhereOp(pred)))
    else
    // one column-pruned scan (id + predicate columns only) TRIES to pull
    // the whole match set to the driver under a cap: a small delete then
    // needs no second pass at all — the buckets AND the tombstone ids
    // both fall out of this one job, and the only other job is the
    // survivor rewrite of the pruned buckets
    probeMatches(all, matches, m.buckets) match {
      case Some(hits) if hits.isEmpty => m // nothing matched: no new version
      case Some(hits) =>
        val affected = hits.map(_._2).toSet
        val survivors = chunksInBuckets(name, m, affected).where(!matches)
        commitDelta(m, survivors, Some(affected),
          PatchIndex(None, Some(InlineIds(hits.map(_._1).toSeq))))
      case None =>
        // at-scale path (the cap tripped): re-derive the exact affected
        // bucket set, rewrite those buckets, and write the tombstone as a
        // distributed parquet part — every step O(matched buckets/rows)
        val affected = all.where(matches)
          .select(bucketCol(m.buckets).as("__b")).distinct()
          .collect().map(_.getInt(0)).toSet
        val pruned = chunksInBuckets(name, m, affected)
        commitDelta(m, pruned.where(!matches), Some(affected),
          PatchIndex(None, Some(IdsFrame(pruned.where(matches).select("id")))))
    }
  }

  /** M4: update one chunk. Re-embeds only if the text changed
    * (chunk_service.py:158-164), preserves metadata.created_at
    * (chunk_service.py:183-187). */
  def updateChunk(
      name: String,
      id: String,
      newText: Option[String] = None,
      newMetadata: Option[Column] = None): LibraryMeta = withWriteLock(name) {
    val m = requireMeta(name)
    // ingest parity: normalize trims and drops blank text at ingest; an
    // update setting blank text must fail LOUDLY (dropping would delete
    // the row), and the trimmed form must be what embeds — the same
    // text ingested vs updated must get the same embedding
    newText.foreach(t => require(t.trim.nonEmpty,
      s"graft ingest validation: text cannot be blank (chunk $id)"))
    val trimmedText = newText.map(_.trim)
    // only the chunk's bucket is READ or written: the manifest names its
    // leaf dirs, every other bucket is referenced, not copied or scanned
    val b = bucketOfId(id, m.buckets)
    val bucket = chunksInBuckets(name, m, Set(b))
    val updated = bucket
      .where(col("id") === id)
      .withColumn("text", trimmedText.map(lit).getOrElse(col("text")))
      .withColumn("embedding",
        if (newText.isDefined) modelOf(m).embedCol(col("text"), m.dim)
        else col("embedding"))
      .withColumn("metadata", newMetadata match {
        case Some(nm) => // replace (validated), preserving created_at
          validatedMetadata(nm)
            .withField("created_at", col("metadata.created_at"))
        case None => col("metadata")
      })
    // the 404 check rides the rewrite itself: an observed metric counts
    // how many written rows carry the target id, so no separate
    // existence-scan job ever reads the bucket, and a miss aborts the
    // commit (nothing published) before any index write
    val obs = org.apache.spark.sql.Observation()
    val bucketRows = bucket
      .where(col("id") =!= id)
      .unionByName(updated)
      .observe(obs, count(when(col("id") === id, 1)).as("hits"))
    // incremental index patch: tombstone the old row's entries, append a
    // part with the re-embedded row's (indexer.delete + add — never a
    // rebuild for a single-chunk update; the same-commit append
    // outlives the tombstone, see artifact()). Metadata-only updates
    // leave the embedding — and therefore the index — untouched.
    val op =
      if (newText.isEmpty) CarryArtifacts
      else incrementalIndexRows(m, name, updated) match {
        case Some(newRows) => PatchIndex(Some(newRows), Some(InlineIds(Seq(id))))
        case None          => CarryArtifacts // no index to maintain
      }
    commitDelta(m, bucketRows, Some(Set(b)), op,
      postWrite = () =>
        if (obs.get("hits").asInstanceOf[Long] == 0L)
          throw new NoSuchElementException(s"chunk not found: $id"),
      metadataOnly = newText.isEmpty)
  }

  // (only createLibrary and rebuildIndex compute a full index; every
  //  mutation patches incrementally, updateMetadataWhere carries every
  //  artifact forward unchanged)

  /** M6: bulk metadata replace for every chunk matching `pred`,
    * preserving each row's created_at (document_service.py:82-102 — our
    * documents are derived from chunks, so "update document metadata"
    * is a predicate update over its chunks). Embeddings are untouched,
    * so the existing index table is carried forward, not rebuilt. */
  def updateMetadataWhere(
      name: String,
      pred: Column,
      newMetadata: Column): LibraryMeta = withWriteLock(name) {
    val m = requireMeta(name)
    val all = chunks(name)
    val matches = coalesce(pred, lit(false))
    if (fitsOneSplit(all))
      // small-library regime: one observed rewrite pass, no probe job
      applyBatch(name, Seq(LibraryCatalog.UpdateMetadataWhereOp(pred, newMetadata)))
    else {
    // one fused probe job finds the affected buckets (and skips the
    // commit entirely when nothing matches); past the cap, fall back to
    // the distributed distinct — the probe only needs the bucket SET
    val affected = probeMatches(all, matches, m.buckets) match {
      case Some(hits) => hits.map(_._2).toSet
      case None =>
        all.where(matches)
          .select(bucketCol(m.buckets).as("__b")).distinct()
          .collect().map(_.getInt(0)).toSet
    }
    if (affected.isEmpty) m // nothing matched: no new version
    else {
      // rewrite only the buckets holding matching rows (read via the
      // manifest, file-pruned), with the replace applied; untouched
      // buckets — and the whole index — are referenced, not copied
      val bucketRows = chunksInBuckets(name, m, affected)
        .withColumn(
          "metadata",
          when(matches,
            validatedMetadata(newMetadata)
              .withField("created_at", col("metadata.created_at")))
            .otherwise(col("metadata")))
      commitDelta(m, bucketRows, Some(affected), CarryArtifacts,
        metadataOnly = true)
    }
    }
  }

  /** M7: delete a document — cascade to all its chunks + reindex
    * (document_service.py:104-123). `strict` adds the reference's 404
    * (document_service.py:77-80): a document with no chunks doesn't
    * exist (documents are DERIVED from chunks here), and an untouched
    * version pointer is exactly that signal — no extra job. */
  def deleteDocument(
      name: String,
      documentId: String,
      strict: Boolean = false): LibraryMeta = withWriteLock(name) {
    val before = requireMeta(name).version
    val after = deleteChunksWhere(name, col("document_id") === documentId)
    if (strict && after.version == before)
      throw new NoSuchElementException(s"document not found: $documentId")
    after
  }

  /** Apply several mutations in ONE commit — exact sequential semantics
    * (each op's predicate sees the state after all earlier ops; a chunk
    * deleted by op i cannot be matched by op i+1), but one probe job, one
    * bucket rewrite, one index patch, one version. The single-commit
    * methods pay their fixed cost (probe job + write job + fs commit) per
    * mutation; a mutation-heavy workload batching N adjacent ops pays it
    * once. Per-row transforms compose as column expressions, so the
    * rewrite stays a single codegen'd pass over only the affected buckets.
    *
    * Past the inline-probe cap — or when a batch containing [[LibraryCatalog.AddChunksOp]]
    * outgrows the one-split regime — the batch degrades to sequential
    * application (same final state, N versions) — at that size per-commit
    * fixed cost no longer dominates the job anyway. */
  def applyBatch(
      name: String,
      ops: Seq[LibraryCatalog.Mutation]): LibraryMeta = withWriteLock(name) {
    import LibraryCatalog._
    val m = requireMeta(name)
    // desugar document cascade to its predicate form (M7 == M5-by-pred)
    // and apply the ingest-parity guards ONCE up front (trimmed
    // non-blank text, validated metadata) so the one-pass arm enforces
    // exactly what the sequential methods do
    val norm: Seq[Mutation] = ops.map {
      case DeleteDocumentOp(d) => DeleteChunksWhereOp(col("document_id") === d)
      case UpdateChunkOp(id, t, md) =>
        t.foreach(x => require(x.trim.nonEmpty,
          s"graft ingest validation: text cannot be blank (chunk $id)"))
        UpdateChunkOp(id, t.map(_.trim), md.map(validatedMetadata))
      case UpdateMetadataWhereOp(p, nm) =>
        UpdateMetadataWhereOp(p, validatedMetadata(nm))
      case o => o
    }
    if (norm.isEmpty) m
    else {
      val nOps = norm.size
      def hitCol(i: Int) = s"__hit_$i"
      // Adds are normalized AND PINNED once (shape + embed +
      // normalizeStable's minted-id materialization) outside the fold —
      // the fold's lineage is evaluated by multiple jobs (probe,
      // chunk write, index rows) and must stage identical rows, down to
      // the minted uuids.
      val normalizedAdds: Map[Int, DataFrame] = norm.zipWithIndex.collect {
        case (AddChunksOp(rows), i) => i -> normalizeStable(rows, m.dim, modelOf(m))
      }.toMap
      // Sequential-state fold: materialize each op's match as a column
      // computed AFTER all earlier transforms, then apply the op's own
      // per-row effect. `__alive` carries delete visibility forward.
      def staged(df0: DataFrame): DataFrame = {
        var df = df0.withColumn("__alive", lit(true))
        norm.zipWithIndex.foreach { case (op, i) =>
          op match {
            case AddChunksOp(_) =>
              // union at position i: earlier ops' hit columns are false on
              // the new rows (they could not have matched them), later ops
              // see them via the fold — exact sequential visibility.
              // coalesce(1): the delta is a small new lineage in many
              // near-empty partitions (e.g. a range source); one task keeps
              // the rewrite's one-file-per-bucket layout instead of
              // scattering a few rows per bucket per source partition —
              // a file-count storm every later scan would pay for
              val added = (0 until i)
                .foldLeft(normalizedAdds(i).coalesce(1)
                  .withColumn("__alive", lit(true)))(
                  (d, j) => d.withColumn(hitCol(j), lit(false)))
                .withColumn(hitCol(i), lit(true))
              df = df.withColumn(hitCol(i), lit(false)).unionByName(added)
            case UpdateChunkOp(id, newText, newMetadata) =>
              df = df.withColumn(hitCol(i),
                col("__alive") && col("id") === lit(id))
              newText.foreach { t =>
                df = df
                  .withColumn("text",
                    when(col(hitCol(i)), lit(t)).otherwise(col("text")))
                  .withColumn("embedding",
                    when(col(hitCol(i)), modelOf(m).embedCol(col("text"), m.dim))
                      .otherwise(col("embedding")))
              }
              newMetadata.foreach { nm =>
                df = df.withColumn("metadata",
                  when(col(hitCol(i)),
                    nm.cast(chunkMetadataType)
                      .withField("created_at", col("metadata.created_at")))
                    .otherwise(col("metadata")))
              }
            case UpdateMetadataWhereOp(pred, nm) =>
              df = df
                .withColumn(hitCol(i),
                  col("__alive") && coalesce(pred, lit(false)))
                .withColumn("metadata",
                  when(col(hitCol(i)),
                    nm.cast(chunkMetadataType)
                      .withField("created_at", col("metadata.created_at")))
                    .otherwise(col("metadata")))
            case DeleteChunksOp(ids) =>
              df = df
                .withColumn(hitCol(i),
                  col("__alive") && col("id").isin(ids: _*))
                .withColumn("__alive", col("__alive") && !col(hitCol(i)))
            case DeleteChunksWhereOp(pred) =>
              df = df
                .withColumn(hitCol(i),
                  col("__alive") && coalesce(pred, lit(false)))
                .withColumn("__alive", col("__alive") && !col(hitCol(i)))
            case DeleteDocumentOp(_) =>
              throw new IllegalStateException("desugared above")
          }
        }
        df
      }
      val all = chunks(name)
      if (fitsOneSplit(all)) {
        // Small-library regime: the whole table is one split's worth of
        // bytes, so bucket pruning buys nothing — skip the probe job
        // entirely and let the per-op match counts (404 / no-op checks)
        // and the deleted-id lists ride the single rewrite pass as
        // OBSERVED metrics. One observed write job + one concurrent
        // index-append job is the entire batch.
        val helperCols = "__alive" +: (0 until nOps).map(hitCol)
        val deleteIdx = norm.zipWithIndex.collect {
          case (_: DeleteChunksOp, i)      => i
          case (_: DeleteChunksWhereOp, i) => i
        }
        val obs = org.apache.spark.sql.Observation()
        val aggs: Seq[Column] =
          (0 until nOps).map(i =>
            sum(when(col(hitCol(i)), 1L).otherwise(0L)).as(s"n_$i")) ++
            deleteIdx.map(i =>
              collect_list(when(col(hitCol(i)), col("id"))).as(s"ids_$i"))
        val bucketRows = staged(all)
          .observe(obs, aggs.head, aggs.tail: _*)
          .where(col("__alive"))
          .drop(helperCols: _*)
        // ids of point updates that re-embed are known statically from the
        // ops themselves — the append lineage needs no observed state and
        // runs concurrently with the observed chunk write. Added rows need
        // index entries too: their hit columns mark them in the staged
        // output (a row added then deleted later in the batch is never
        // indexed — `__alive` gates the append — and its tombstone is a
        // harmless no-op; search results match the sequential order).
        val textUpdatedIds = norm.collect {
          case UpdateChunkOp(id, Some(_), _) => id
        }
        val addIdx = norm.zipWithIndex.collect {
          case (_: AddChunksOp, i) => i
        }
        val needsIndexRow = addIdx
          .map(i => col(hitCol(i)))
          .foldLeft(
            if (textUpdatedIds.isEmpty) lit(false)
            else col("id").isin(textUpdatedIds: _*))(_ || _)
        val appends =
          if (textUpdatedIds.isEmpty && addIdx.isEmpty) None
          else incrementalIndexRows(m, name,
            staged(all).where(col("__alive") && needsIndexRow)
              .drop(helperCols: _*))
        val deletedIds = () => deleteIdx.flatMap(i =>
          obs.get(s"ids_$i").asInstanceOf[scala.collection.Seq[String]])
        val hasTombstones = deleteIdx.nonEmpty || textUpdatedIds.nonEmpty
        val op =
          if (!hasTombstones && appends.isEmpty) CarryArtifacts
          else PatchIndex(appends,
            if (!hasTombstones) None
            else Some(LazyIds(() =>
              (deletedIds() ++ textUpdatedIds).distinct.toSeq)))
        // every manifest bucket repoints to the rewrite (emptied buckets
        // drop out via presentBuckets)
        val replaceAll = readManifest(name, m.version).keySet
        try {
          commitDelta(m, bucketRows, Some(replaceAll), op, postWrite = () => {
            norm.zipWithIndex.foreach {
              case (UpdateChunkOp(id, _, _), i)
                  if obs.get(s"n_$i").asInstanceOf[Long] == 0L =>
                throw new NoSuchElementException(s"chunk not found: $id")
              case _ => ()
            }
            if ((0 until nOps)
                .map(i => obs.get(s"n_$i").asInstanceOf[Long]).sum == 0L)
              throw NoopMutation
          },
            // metadataOnly certifies NO (id, embedding) pair changed.
            // `op == CarryArtifacts` is NOT that certificate here: on an
            // HNSW library an add-only batch yields CarryArtifacts
            // (incrementalIndexRows has no graph rows to append), and
            // treating it as metadata-only would carry the persisted
            // graph forward WITHOUT the added rows — silently invisible
            // to every search until an unrelated rebuild. Track the row
            // changes themselves.
            metadataOnly =
              !hasTombstones && addIdx.isEmpty && textUpdatedIds.isEmpty)
        } catch {
          case NoopMutation => m // nothing matched: no new version
        }
      } else applyBatchProbed(name, m, norm, ops, staged _)
    }
  }

  /** The at-scale arm of [[applyBatch]]: one column-pruned probe job pulls
    * every matched (id, bucket, per-op hit) to the driver under the inline
    * cap, then only the affected buckets are rewritten. Past the cap the
    * batch degrades to sequential single-commit application. */
  /** Sequential degradation shared by both applyBatch fallbacks: each
    * mutation through its own single-commit method, returning the final
    * meta. */
  private def applySequentially(
      name: String,
      m: LibraryMeta,
      ops: Seq[LibraryCatalog.Mutation]): LibraryMeta = {
    import LibraryCatalog._
    ops.foldLeft(m) { (_, op) =>
      op match {
        case UpdateChunkOp(id, t, md)     => updateChunk(name, id, t, md)
        case UpdateMetadataWhereOp(p, nm) => updateMetadataWhere(name, p, nm)
        case DeleteChunksOp(ids)          => deleteChunks(name, ids)
        case DeleteChunksWhereOp(p)       => deleteChunksWhere(name, p)
        case DeleteDocumentOp(d)          => deleteDocument(name, d)
        case AddChunksOp(rows)            => addChunks(name, rows)
      }
    }
  }

  private def applyBatchProbed(
      name: String,
      m: LibraryMeta,
      norm: Seq[LibraryCatalog.Mutation],
      ops: Seq[LibraryCatalog.Mutation],
      staged: DataFrame => DataFrame): LibraryMeta = {
    import LibraryCatalog._
    // The probe pass only covers EXISTING rows; a batch that also adds
    // rows applies sequentially past the one-split regime (an at-scale
    // bulk add is a data job, not per-commit overhead — the single-pass
    // arm is the small-library play).
    if (norm.exists(_.isInstanceOf[AddChunksOp]))
      return applySequentially(name, m, ops)
    val nOps = norm.size
    def hitCol(i: Int): String = s"__hit_$i"
      // ONE probe job: (id, bucket, per-op hit) for rows any op touched.
      // Column pruning drops the text/embedding transforms unless a later
      // predicate actually reads them.
      val anyHit = (0 until nOps).map(i => col(hitCol(i))).reduce(_ || _)
      val probe = staged(chunks(name))
        .where(anyHit)
        .select(col("id") +: bucketCol(m.buckets).as("__b") +:
          (0 until nOps).map(i => col(hitCol(i))): _*)
      val rows =
        (if (fitsOneSplit(probe)) probe.coalesce(1) else probe)
          .limit(MaxInlineTombstone + 1)
          .collect()
      if (rows.length > MaxInlineTombstone) {
        // cap tripped: fall back to the sequential single-commit methods
        applySequentially(name, m, ops)
      } else {
        // 404 parity (chunk_service.py:193-217): a point update that
        // matched nothing aborts the whole batch before anything writes
        norm.zipWithIndex.foreach {
          case (UpdateChunkOp(id, _, _), i)
              if !rows.exists(_.getBoolean(2 + i)) =>
            throw new NoSuchElementException(s"chunk not found: $id")
          case _ => ()
        }
        if (rows.isEmpty) m // nothing matched: no new version
        else {
          val affected = rows.map(_.getInt(1)).toSet
          val helperCols = "__alive" +: (0 until nOps).map(hitCol)
          val bucketRows = staged(chunksInBuckets(name, m, affected))
            .where(col("__alive"))
            .drop(helperCols: _*)
          // index patch: tombstone every deleted id plus every re-embedded
          // id; append fresh signature rows for surviving re-embedded rows
          // (same same-commit append-outlives-tombstone semantics as
          // updateChunk)
          val deleteIdx = norm.zipWithIndex.collect {
            case (_: DeleteChunksOp, i)      => i
            case (_: DeleteChunksWhereOp, i) => i
          }
          val deletedIds = rows
            .filter(r => deleteIdx.exists(i => r.getBoolean(2 + i)))
            .map(_.getString(0))
          val textUpdatedIds = norm.zipWithIndex.collect {
            case (UpdateChunkOp(id, Some(_), _), i)
                if rows.exists(r => r.getBoolean(2 + i)) => id
          }
          val tombstoneIds = (deletedIds ++ textUpdatedIds).distinct
          val appends =
            if (textUpdatedIds.isEmpty) None
            else incrementalIndexRows(m, name,
              bucketRows.where(col("id").isin(textUpdatedIds: _*)))
          val op =
            if (tombstoneIds.isEmpty && appends.isEmpty) CarryArtifacts
            else PatchIndex(appends,
              if (tombstoneIds.isEmpty) None
              else Some(InlineIds(tombstoneIds.toSeq)))
          // same certificate as the small-library arm: CarryArtifacts
          // here means no adds/deletes/re-embeds in the batch
          commitDelta(m, bucketRows, Some(affected), op,
            metadataOnly = op == CarryArtifacts)
        }
      }
  }

  /** Library-level update (library_service.py:156-170 / the PUT
    * /libraries endpoint, test_e2e.py:124-145): rename and/or replace
    * the library tags, preserving created_at and bumping updated_at.
    * Rename is one directory move — version dirs are library-relative,
    * so data, indexes, and the version pointer all ride along. */
  def updateLibrary(
      name: String,
      newName: Option[String] = None,
      newTags: Option[Seq[String]] = None): LibraryMeta = {
    // a rename involves TWO names: without the target's lock, a
    // concurrent createLibrary(target) can interleave between the
    // exists() check and the rename — under Hadoop rename semantics an
    // existing destination directory swallows the source INSIDE it,
    // orphaning the library. Locks acquire in sorted order (the global
    // convention that makes two concurrent renames deadlock-free).
    val target0 = newName.getOrElse(name)
    val lockNames = Seq(name, target0).distinct.sorted
    lockNames.foldRight(() => updateLibraryLocked(name, newName, newTags)) {
      (n, inner) => () => withWriteLock(n)(inner())
    }()
  }

  private def updateLibraryLocked(
      name: String,
      newName: Option[String],
      newTags: Option[Seq[String]]): LibraryMeta = {
    val m = requireMeta(name)
    val target = newName.getOrElse(name)
    if (target != name) {
      validateName(target)
      if (exists(target))
        throw new IllegalStateException(s"library already exists: $target")
      if (!fs.rename(libDir(name), libDir(target)))
        throw new IllegalStateException(s"rename failed: $name -> $target")
      // the OLD name's cached graphs/schemas must not survive the
      // rename: a library recreated under it would silently serve the
      // renamed library's index (same eviction deleteLibrary does)
      artifactSchemas.keys.filter(_._1 == name).foreach(artifactSchemas.remove)
      evictStaleHnsw(name, current = -1L)
      // same reason for the ANN probe registry: the OLD token must not
      // keep probing the renamed library's artifacts
      graft.plans.AnnProbeRule.deregister(name)
    }
    val updated = m.copy(
      name = target,
      tags = newTags.getOrElse(m.tags),
      updatedAt = now())
    writeMeta(updated)
    syncAnnProbeRegistration(updated)
    updated
  }

  /** Streaming-ingest idempotence markers: the last micro-batch id a
    * named stream applied to this library (see
    * StreamingIngest.ingestInto — foreachBatch is at-least-once, so
    * replays must be detectable). One tiny file per (library, source),
    * atomically overwrite-renamed like meta.json. */
  /** Injective marker filename for a raw sourceId: the readable
    * sanitized prefix alone would collide (e.g. "a/b" vs "a_b" — two
    * streams would read each other's batch ids and silently skip real
    * batches as replays), so an md5 of the RAW id is appended. */
  private def ingestMarkerName(sourceId: String): String = {
    val readable = sourceId.replaceAll("[^A-Za-z0-9._-]", "_").take(64)
    // shared derivation (Md5Expressions.hexDigestUtf8): marker names are
    // durable identities — divergent copies would re-key them
    val digest = Md5Expressions.hexDigestUtf8(sourceId).take(16)
    s"${readable}-$digest"
  }

  def lastIngestedBatch(name: String, sourceId: String): Option[Long] = {
    def readMarker(fileName: String): Option[Long] = {
      val p = new Path(libDir(name), fileName)
      if (!fs.exists(p)) None
      else scala.util.Try(readSmallTextFile(p).trim.toLong).toOption
    }
    readMarker(s"_ingest_${ingestMarkerName(sourceId)}")
      // migration: warehouses written before the injective naming carry
      // markers under the bare sanitized id — without this fallback a
      // post-upgrade stream restart would see None and RE-INGEST the
      // replayed batch (the exact duplicate the marker prevents). The
      // next recordIngestedBatch writes the new name, which then shadows
      // the legacy file here. ONLY consulted when sanitizing rewrote
      // nothing: for a rewritten id (e.g. "a/b" → "a_b") the legacy
      // filename is shared with every id that sanitizes the same way,
      // so reading it would let one stream consume another's batch id
      // and silently skip a real batch — the exact collision the
      // injective naming exists to prevent. Rewritten-id markers from
      // the legacy era are unrecoverable-ambiguous by construction;
      // treating them as absent re-ingests at most one replayed batch
      // (idempotent downstream) instead of dropping a real one.
      .orElse {
        val sanitized = sourceId.replaceAll("[^A-Za-z0-9._-]", "_")
        if (sanitized == sourceId) readMarker(s"_ingest_$sanitized")
        else None
      }
  }

  def recordIngestedBatch(name: String, sourceId: String, batchId: Long): Unit = {
    val safe = ingestMarkerName(sourceId)
    val tmp = new Path(libDir(name), s"_ingest_$safe.tmp")
    val out = fs.create(tmp, true)
    try out.write(batchId.toString.getBytes("UTF-8"))
    finally out.close()
    try
      org.apache.hadoop.fs.FileContext
        .getFileContext(tmp.toUri, fs.getConf)
        .rename(tmp, new Path(libDir(name), s"_ingest_$safe"),
          org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    catch {
      case e: Exception =>
        throw new IllegalStateException(
          s"ingest marker swap failed for $name/$sourceId", e)
    }
  }

  /** M8: drop the library (the reference's endpoint is broken,
    * endpoints/libraries.py:104 — intended semantics implemented). */
  def deleteLibrary(name: String): Unit = withWriteLock(name) {
    fs.delete(libDir(name), true)
    // a later create under the same name may use a different indexer —
    // drop the cached artifact schemas (and any cached hnsw graphs)
    artifactSchemas.keys.filter(_._1 == name).foreach(artifactSchemas.remove)
    evictStaleHnsw(name, current = -1L)
    // ... and the ANN probe registration: a deleted library's token must
    // fail loudly (unregistered), never probe GC'd artifacts
    graft.plans.AnnProbeRule.deregister(name)
    ()
  }

  /** Maintenance/observability detail of a library (the DESCRIBE DETAIL
    * analog): the version pointer plus the read-amplification counters
    * an operator schedules [[compactLibrary]] by — how many leaf dirs
    * each bucket's read touches, and how many index parts + deletion-
    * vector parts every probe reconciles. Pure driver-side metadata
    * (manifest + artifact lists); no data is scanned. */
  case class LibraryDetail(
      meta: LibraryMeta,
      chunkLeafDirs: Int,
      maxLeavesPerBucket: Int,
      indexParts: Int,
      indexDeleteParts: Int)

  def describeLibrary(name: String): LibraryDetail = {
    val m = requireMeta(name)
    val mf = readManifest(name, m.version)
    val refs = readArtifactRefs(name, m.version)
    LibraryDetail(
      meta = m,
      chunkLeafDirs = mf.values.map(_.size).sum,
      maxLeavesPerBucket = if (mf.isEmpty) 0 else mf.values.map(_.size).max,
      indexParts = refs.get("index").map(_.size).getOrElse(0),
      indexDeleteParts = refs.get("index_deletes").map(_.size).getOrElse(0))
  }

  /** Maintenance compaction (the Delta/Iceberg OPTIMIZE analog): rewrite
    * the current rows as one fresh full commit, collapsing however many
    * delta parts, carried-forward leaf dirs, and deletion vectors the
    * mutation history accumulated back to one leaf per bucket and one
    * index artifact. Mutations never pay this cost implicitly — delta
    * commits stay O(delta) and an operator schedules compaction when
    * read amplification (part count) warrants it. */
  def compactLibrary(name: String): LibraryMeta =
    compactLibrary(name, Set.empty)

  private def compactLibrary(
      name: String, extraKeep: Set[String]): LibraryMeta = withWriteLock(name) {
    val m = requireMeta(name)
    commitFull(m, chunks(name), written => buildIndex(m, written), extraKeep)
  }

  /** M9: rebuild the index table from the current chunks. The chunk data
    * is UNCHANGED by a rebuild, so the manifest carries forward by
    * reference and only the index artifacts are recomputed and written —
    * at 100 TB a rebuild costs O(index), never a rewrite of the corpus.
    * The fresh artifact list also compacts away any accumulated delta
    * parts and deletion vectors (the read side goes back to one pruned
    * scan). */
  def rebuildIndex(name: String): LibraryMeta = withWriteLock(name) {
    val m = requireMeta(name)
    val v = m.version + 1
    val vdir = versionDir(m.name, v)
    val vname = vdir.getName
    claimVersion(m.name, vdir)
    try {
      val mf = readManifest(m.name, m.version)
      writeManifest(vdir, mf)
      val arts = buildIndex(m, readChunksAt(m.name, mf))
      writeArtifacts(vdir, arts, fileParallel = true)
      writeArtifactRefs(vdir, arts.map(a => a.name -> Seq(vname)).toMap)
      finishCommit(m, v, mf)
    } catch {
      case e: Throwable => cleanupFailedCommit(m.name, v, vdir); throw e
    }
  }

  // -------------------------------------------------------------- search

  /** Driver-local HNSW graphs, one per (library, version). Stale
    * versions are EVICTED: every commit drops the library's older
    * entries ([[finishCommit]]) and a lazy rebuild does the same — a
    * mutation-heavy workload must not accumulate one full graph per
    * superseded version in driver memory. In-flight readers holding an
    * evicted graph keep their reference (plain GC semantics); only the
    * cache forgets it. String chunk ids are mapped to collect-order
    * ordinals for the graph. */
  private val hnswGraphs =
    new scala.collection.concurrent.TrieMap[(String, Long), (HnswIndex, IndexedSeq[String])]

  /** Driver-local quantizer cache: the collected IVF coarse centroids
    * and (ivfpq only) PQ codebook per (library, version). Both are
    * bounded build-time constants (nList vectors / m*k sub-centroids),
    * but collecting them launched one or two Spark jobs PER SEARCH —
    * pure fixed overhead on the probe path. Same discipline as
    * [[hnswGraphs]]: version-keyed (a concurrent commit can never get
    * v+1 quantizers served under v), stale versions evicted on access,
    * in-flight readers keep plain GC semantics. */
  private val quantizers = new scala.collection.concurrent.TrieMap[
    (String, Long),
    (IndexedSeq[Array[Float]], Option[Array[Array[Array[Double]]]])]

  /** Versions of `name` currently in the quantizer cache (eviction
    * spec hook, mirroring [[hnswGraphVersionsCached]]). */
  private[graft] def quantizerVersionsCached(name: String): Int =
    quantizers.keys.count(_._1 == name)

  private def quantizersFor(
      name: String,
      version: Long,
      centsDf: => DataFrame,
      cbDf: => Option[DataFrame])
      : (IndexedSeq[Array[Float]], Option[Array[Array[Array[Double]]]]) = {
    quantizers.keys
      .filter { case (n, ver) => n == name && ver != version }
      .foreach(quantizers.remove)
    quantizers.getOrElseUpdate((name, version),
      (IvfIndex.centroidsOf(centsDf), cbDf.map(PqIndex.codebookOf(_, pqParams))))
  }

  /** Versions of `name` currently held in the driver-local graph cache
    * (exposed for the eviction spec). */
  private[graft] def hnswGraphVersionsCached(name: String): Int =
    hnswGraphs.keys.count(_._1 == name)

  private def evictStaleHnsw(name: String, current: Long): Unit =
    hnswGraphs.keys
      .filter { case (n, ver) => n == name && ver != current }
      .foreach(hnswGraphs.remove)

  private val HnswGraphArtifact = "hnsw_graph"
  private val HnswMetaArtifact = "hnsw_meta"
  private val HnswPartsArtifact = "hnsw_parts"

  /** FIXED partition count for the over-cap partitioned graph artifact
    * and its build fallback. Per-partition HNSW graphs are approximate
    * structures whose candidates depend on which ids share a partition,
    * so a session-conf-derived count would make the same committed
    * version answer differently across sessions (Verify, Bench, and a
    * user session all run different shuffle-partition settings) and
    * make every exact-hash gate over this path environment-dependent.
    * One constant, used by the artifact build AND the fallback, keeps
    * the redirect deterministic per version. */
  private[graft] val HnswPartsCount = 32

  /** Build-fallback rows for the over-cap redirect, memoized per
    * (library, version) with the [[hnswGraphs]] eviction discipline
    * and EAGERLY checkpointed. Since delta commits PATCH hnsw_parts
    * ([[patchHnswPartsRefs]]) this is a compatibility path only —
    * legacy warehouses whose artifact was dropped by a pre-patch
    * delta commit — but on that path every subsequent search would
    * re-pay the full per-partition insert sequence (~21 s at x100)
    * without the memoization. The checkpoint materializes the graphs
    * once per (catalog instance, version); rebuildIndex/compactLibrary
    * re-persist the durable artifact. */
  private val hnswPartsRows =
    new scala.collection.concurrent.TrieMap[(String, Long), DataFrame]

  /** Versions of `name` currently memoized in the build-fallback cache
    * (spec hook: a search served by the PATCHED artifact must leave
    * this at 0 — taking the fallback means the patch refs were lost). */
  private[graft] def hnswPartsFallbacksCached(name: String): Int =
    hnswPartsRows.keys.count(_._1 == name)

  private def hnswPartsFallback(
      name: String, version: Long, all: DataFrame): DataFrame = {
    // eviction must UNPERSIST, not just drop the map entry: the evicted
    // frames are eager localCheckpoints whose materialized blocks stay
    // in the block manager until a driver GC lets ContextCleaner find
    // them — a long-lived catalog taking repeated delta commits to an
    // over-cap library would accumulate checkpoint storage between GCs
    hnswPartsRows.keys
      .filter { case (n, ver) => n == name && ver != version }
      .foreach(k => hnswPartsRows.remove(k).foreach(
        org.apache.spark.sql.graft.ColumnBridge.unpersistCheckpoint))
    hnswPartsRows.getOrElseUpdate((name, version),
      HnswIndex.partitionedGraphRowsKeyed(
        all, HnswPartsCount, "id", "embedding").localCheckpoint(true))
  }

  /** PATCH the persisted over-cap partitioned-graph artifact at a delta
    * commit — the O(touched-partitions) alternative to dropping it
    * (which made the next cold search pay a full per-partition rebuild,
    * ~21 s at ×100). Soundness: partition membership is a pure function
    * of the id (`pmod(xxhash64(id), HnswPartsCount)`) and each
    * partition's graph is a pure function of its own (id, embedding)
    * set (string-sorted insertion, fixed seed), so rebuilding ONLY the
    * partitions whose membership or vectors changed and carrying every
    * other partition's rows yields rows bit-identical to a from-scratch
    * build over the new corpus (IndexPersistenceSpec pins this).
    *
    * Mechanics reuse the generic artifact version-list machinery: the
    * rebuilt partitions' rows are written into THIS version dir, every
    * id the old graph holds in those partitions is tombstoned
    * (`hnsw_parts_deletes` — the [[artifactAt]] reconciliation then
    * drops all their older rows while this version's fresh rows
    * survive), and both ref lists gain this version. Read amplification
    * is bounded by [[maybeAutoCompact]] exactly like chunk buckets.
    *
    * Partitions to rebuild: any partition receiving a delta row (a new
    * id, or an update re-embedding under the same id) and any partition
    * the old graph holds an id for that the new corpus no longer has
    * (bucket-replacement deletes). The delta is read back from the
    * just-written version dir (data at rest — never re-executes the
    * delta's lineage). Returns the refs map to publish:
    *   - no persisted artifact (under-cap or legacy drop): refs without
    *     the artifact keys — the memoized [[hnswPartsFallback]] remains
    *     the compatibility path;
    *   - no partition actually changed: refs unchanged (pure carry);
    *   - otherwise: both lists extended with this version. */
  private def patchHnswPartsRefs(
      m: LibraryMeta,
      vdir: Path,
      vname: String,
      mf: Map[Int, Seq[String]],
      refs: Map[String, Seq[String]]): Map[String, Seq[String]] = {
    val deletesArtifact = HnswPartsArtifact + "_deletes"
    val old = artifactAt(m.name, HnswPartsArtifact, m.version).getOrElse(
      return refs - HnswPartsArtifact - deletesArtifact)
    def partOf(c: Column): Column =
      pmod(xxhash64(c.cast("string")), lit(HnswPartsCount)).cast("int")
    val newCorpus = readChunksAt(m.name, mf)
    val deltaChunksDir = new Path(vdir, "chunks")
    val deltaIds =
      if (fs.exists(deltaChunksDir))
        spark.read.schema(chunkSchema)
          .parquet(deltaChunksDir.toString)
          .select("id")
      else idsDf(Seq.empty)
    val oldIdParts = old.select(col("part").cast("int").as("part"), col("id"))
    val changed = oldIdParts
      .join(newCorpus.select("id"), Seq("id"), "left_anti")
      .select("part")
      .unionByName(deltaIds.select(partOf(col("id")).as("part")))
      .distinct().collect().map(_.getInt(0)).toSet
    if (changed.isEmpty) return refs
    val changedSeq = changed.toSeq.sorted
    // repartition before write for the same reason as buildIndex's
    // over-cap branch: writeClustered's coalesce(1) must not fuse into
    // (and serialize) the graph-build stage
    val rebuilt = HnswIndex.partitionedGraphRowsKeyed(
      newCorpus.where(partOf(col("id")).isin(changedSeq: _*)),
      HnswPartsCount, "id", "embedding")
      .repartition(HnswPartsCount, col("part"))
    writeArtifacts(vdir,
      Seq(IndexArtifact(HnswPartsArtifact, rebuilt, Seq("part"))))
    // a partition emptied by the delta writes no part dir; publish the
    // parts ref only when rows actually landed
    val wroteParts = fs.listStatus(new Path(vdir, HnswPartsArtifact))
      .exists(s => s.isDirectory && s.getPath.getName.startsWith("part="))
    val tomb = oldIdParts.where(col("part").isin(changedSeq: _*)).select("id")
    val nTomb = tomb.count()
    if (nTomb > 0)
      tomb.coalesce(1).write.mode("overwrite")
        .parquet(new Path(vdir, deletesArtifact).toString)
    def extended(r: Map[String, Seq[String]], k: String) =
      r.updated(k, r.getOrElse(k, Seq.empty) :+ vname)
    val withParts = if (wroteParts) extended(refs, HnswPartsArtifact) else refs
    if (nTomb > 0) extended(withParts, deletesArtifact) else withParts
  }

  /** Deterministic driver-local hnsw build: rows SORTED BY ID before
    * insertion, so the graph is a pure function of the (id, embedding)
    * set — independent of physical file layout or collect order — and
    * the persisted artifact, a lazy rebuild, and a rebuildIndex all
    * produce bit-identical graphs. None when the corpus exceeds
    * [[hnswMaxRows]] (same guard as HnswIndex.fromDataFrame: redirect,
    * never a driver OOM). */
  private[graft] def buildHnswGraph(
      all: DataFrame): Option[(HnswIndex, IndexedSeq[String])] = {
    val rows =
      all.select("id", "embedding").orderBy("id").limit(hnswMaxRows + 1).collect()
    if (rows.length > hnswMaxRows) None
    else {
      val ids = rows.map(_.getString(0)).toIndexedSeq
      val idx = HnswIndex.build(
        rows.iterator.zipWithIndex.map { case (r, i) =>
          (i.toLong, r.getSeq[Float](1).toArray)
        })
      Some((idx, ids))
    }
  }

  /** Load the persisted graph artifact written by [[buildIndex]] — one
    * bounded parquet read (graph rows ≤ [[hnswMaxRows]] by construction)
    * instead of the O(n log n) rebuild. None when no current artifact
    * exists: never written (over-cap library) or dropped by a delta
    * commit (see [[commitDelta]] — the graph is a whole-corpus structure,
    * not an O(delta)-patchable table, so mutations invalidate it and the
    * next cold read rebuilds lazily; rebuildIndex/compactLibrary
    * re-persist it). */
  private[graft] def loadPersistedHnsw(
      name: String): Option[(HnswIndex, IndexedSeq[String])] =
    loadPersistedHnswAt(name, requireMeta(name).version)

  private def loadPersistedHnswAt(
      name: String, v: Long): Option[(HnswIndex, IndexedSeq[String])] =
    for {
      g <- artifactAt(name, HnswGraphArtifact, v)
      meta <- artifactAt(name, HnswMetaArtifact, v)
      rows = g.select("ord", "id", "level", "vec", "nbrs")
        .orderBy("ord").limit(hnswMaxRows + 1).collect()
      // a graph persisted under a LARGER session cap (e.g. a durable
      // warehouse written before the cap was lowered) must not crash a
      // default-constructed catalog: None falls through to
      // buildHnswGraph, which returns None over-cap too, and search
      // takes the documented partitioned redirect — the same contract
      // as a never-persisted over-cap library
      if rows.length <= hnswMaxRows
    } yield {
      val ids = rows.map(_.getString(1)).toIndexedSeq
      val mr = meta.select("entry", "next_ordinal").head()
      val idx = HnswIndex.restore(
        rows.iterator.map(r => (
          r.getLong(0),
          r.getSeq[Float](3).toArray,
          r.getInt(2),
          r.getSeq[scala.collection.Seq[Long]](4).map(_.toArray).toArray)),
        entry = if (mr.isNullAt(0)) None else Some(mr.getLong(0)),
        nextOrd = mr.getLong(1))
      (idx, ids)
    }

  /** Current load-or-build graph for `name` (exposed for
    * IndexPersistenceSpec's identity and warm-read assertions). */
  private[graft] def hnswGraph(name: String): (HnswIndex, IndexedSeq[String]) = {
    val m = requireMeta(name)
    hnswFor(name, m.version, chunks(name))
  }

  /** Driver-local graph for (name, version) when the library fits under
    * [[hnswMaxRows]]; None above the cap — [[search]] then redirects to
    * the distributed per-partition path. Memoized per version (the graph
    * load is pinned to THIS version — a concurrent commit must never get
    * its v+1 graph memoized under v's cache key). */
  private def hnswForOpt(
      name: String,
      version: Long,
      all: DataFrame): Option[(HnswIndex, IndexedSeq[String])] = {
    evictStaleHnsw(name, version)
    hnswGraphs.get((name, version)).orElse {
      val loaded = loadPersistedHnswAt(name, version).orElse(buildHnswGraph(all))
      loaded.foreach(hnswGraphs.putIfAbsent((name, version), _))
      loaded
    }
  }

  private def hnswFor(
      name: String,
      version: Long,
      all: DataFrame): (HnswIndex, IndexedSeq[String]) =
    hnswForOpt(name, version, all).getOrElse(
      throw new IllegalArgumentException(
        s"hnsw library '$name' exceeds the driver-local graph cap of " +
          s"$hnswMaxRows rows; searches redirect to the partitioned path " +
          "automatically — this driver-graph surface has no graph to return"))

  /** The flagship read path (SURVEY.md §3.1): embed query text → index
    * search → conjunctive tag post-filter (AFTER top-k, may return < k —
    * P1/T4 quirk preserved) → score in the requested metric while ranking
    * in the index default (K5 quirk, behind `strictParity`) → projection
    * flags (P3) → under-k warning (T5).
    */
  def search(
      name: String,
      queryText: String,
      k: Int = 5,
      metric: Metric = Euclidean,
      filterTags: Seq[String] = Seq.empty,
      includeMetadata: Boolean = true,
      includeEmbeddings: Boolean = false,
      strictParity: Boolean = true): DataFrame = {
    val m = requireMeta(name)
    // EVERYTHING this query reads is pinned to m.version: re-resolving
    // the pointer per table would let a concurrent commit pair
    // version-v chunks with version-v+1 index artifacts (wrong or
    // shrunken candidate sets mid-snapshot)
    val all = chunksAt(name, m.version)
    val qv = modelOf(m).embedLocal(queryText, m.dim).toSeq
    // ranking metric: the reference ALWAYS ranks with the indexer default
    // (euclidean) and only scores with the requested metric
    // (library_service.py:196-223); strictParity=false honors the metric.
    val rankMetric = if (strictParity) Euclidean else metric
    val base = m.indexer match {
      case LshIndexer =>
        artifactAt(name, "index", m.version) match {
          case Some(sig) =>
            // the persisted sig table is table_idx-partitioned: the
            // pruned probe reads L one-partition scans, not the corpus
            LshIndex.candidateBasePruned(all, sig, qv, k, lshParams(m.dim), "id")
          case None => all
        }
      case IvfIndexer =>
        (artifactAt(name, "index", m.version),
          artifactAt(name, "centroids", m.version)) match {
          case (Some(asn), Some(centsDf)) =>
            // cell-partitioned assignments: nProbe partition dirs read;
            // centroids come from the per-version driver cache — the
            // probe launches no quantizer collect job after the first
            val (cents, _) = quantizersFor(name, m.version, centsDf, None)
            IvfIndex.candidateBaseWithCents(all, asn, cents, qv, k, ivfParams, "id")
          case _ => all
        }
      case IvfPqIndexer =>
        (artifactAt(name, "index", m.version),
          artifactAt(name, "centroids", m.version),
          artifactAt(name, "codebook", m.version)) match {
          case (Some(codes), Some(centsDf), Some(cbT)) =>
            // cell-pruned codes read, ADC-ranked to RefineFactor*k
            // candidate ids, exact re-rank below; under-k → full scan.
            // Both quantizers (coarse centroids + codebook) served from
            // the per-version driver cache — zero collect jobs warm.
            val (cents, cbOpt) =
              quantizersFor(name, m.version, centsDf, Some(cbT))
            PqIndex.candidateBaseWithQuantizers(
              all, codes, cents, cbOpt.get, qv, k, pqParams, "id")
          case _ => all
        }
      case HnswIndexer =>
        hnswForOpt(name, m.version, all) match {
          case Some((idx, idOf)) =>
            // driver-local graph (K3), memoized per library version; graph
            // candidates are then re-ranked by the shared pipeline below
            val ids = idx.search(qv.toArray, k)
              .map { case (ord, _) => idOf(ord.toInt) }
            if (ids.isEmpty) all else all.where(col("id").isin(ids: _*))
          case None =>
            // OVER-CAP REDIRECT (the 100 TB contract): a library grown
            // past hnswMaxRows transparently takes the distributed
            // per-partition graph path — no driver-side corpus collect,
            // no caller-visible API change. The PERSISTED per-partition
            // graphs (hnsw_parts, written by buildIndex and PATCHED
            // per-partition by delta commits) are RESTORED, never
            // rebuilt, so a cold search — even right after a mutation —
            // pays pruned artifact reads instead of the full insert
            // sequence; the in-flight build runs only when the artifact
            // is absent (legacy warehouse whose artifact a pre-patch
            // delta dropped) and produces bit-identical rows — probe
            // results agree by construction. Candidates (≤ k ids after the global
            // merge, deterministic for this pinned version) semi-join
            // back into the shared re-rank pipeline below.
            val rows = artifactAt(name, HnswPartsArtifact, m.version)
              .getOrElse(hnswPartsFallback(name, m.version, all))
            val cand = HnswIndex
              .probeGraphRowsKeyed(rows, Seq((0L, qv.toArray)), k)
              .select("id")
            all.join(broadcast(cand), Seq("id"), "left_semi")
        }
      case _ => all // flat: exact scan
    }
    val ranked = FlatKnn.searchWithColumns(
      base, qv, k, rankMetric, "id", "embedding",
      Seq("document_id", "text", "metadata", "embedding"))
    val scored = ranked.withColumn("score",
      VectorFunctions.distance(col("embedding"), typedLit(qv), metric))
    val tagged = filterTags.foldLeft(scored)((df, t) =>
      df.where(array_contains(col("metadata.tags"), t)))
    val projected = tagged.select(
      Seq(col("id"), col("document_id"), col("text"), col("dist"), col("score")) ++
        (if (includeMetadata) Seq(col("metadata")) else Nil) ++
        (if (includeEmbeddings) Seq(col("embedding")) else Nil): _*)
    // T5 (flat_index.py:96-108) without a second job: the old
    // `projected.count()` re-ran embed→scan→distance→top-k once per call
    // just to emit this warning. `observe` piggybacks the count on the
    // caller's own execution; the session-wide listener logs under-k
    // results when the query actually runs.
    LibraryCatalog.ensureUnderKListener(spark)
    projected.observe(
      LibraryCatalog.underKObservationName(name, k, filterTags.nonEmpty),
      count(lit(1)).as("n"))
  }

  // (companion holds the under-k observation listener — see object below)

  /** Search + document join (J1): distinct doc ids of the results,
    * broadcast-joined back to the derived documents view
    * (library_service.py:225-241). */
  def searchWithDocuments(
      name: String,
      queryText: String,
      k: Int = 5,
      metric: Metric = Euclidean): DataFrame = {
    val res = search(name, queryText, k, metric)
    val docs = documents(name).withColumnRenamed("id", "matched_document_id")
    // broadcast the ≤ k-ROW result side, never the corpus-wide derived
    // documents view — at scale the view is a full-library aggregation
    // whose broadcast would blow the size limit
    broadcast(res)
      .join(docs, res("document_id") === docs("matched_document_id"))
      .drop("matched_document_id")
  }
}

object LibraryCatalog {

  /** Sentinel for [[LibraryCatalog.createLibrary]]'s `numBuckets`: size
    * the bucket count from the input's optimizer stats instead of a
    * fixed constant (~64 MB of estimated input per bucket, clamped to
    * [1, 65536]). */
  val AutoBuckets = 0

  /** Default read-amplification bound before a delta commit triggers
    * auto-compaction (see maybeAutoCompact): 32 parts per bucket/
    * artifact keeps the worst scan fan-in bounded while compacting
    * rarely enough that sustained small-delta ingest stays O(delta)
    * amortized. */
  val DefaultAutoCompactRefs = 32

  /** Mutations expressible in [[LibraryCatalog.applyBatch]] — each the
    * batched twin of the corresponding single-commit method. */
  sealed trait Mutation
  final case class UpdateChunkOp(
      id: String,
      newText: Option[String] = None,
      newMetadata: Option[Column] = None) extends Mutation
  final case class UpdateMetadataWhereOp(
      pred: Column, newMetadata: Column) extends Mutation
  final case class DeleteChunksOp(ids: Seq[String]) extends Mutation
  final case class DeleteChunksWhereOp(pred: Column) extends Mutation
  final case class DeleteDocumentOp(documentId: String) extends Mutation
  /** M2/M3 inside a batch: the rows union into the sequential-state fold
    * at their position, so a LATER op's predicate sees them (and an
    * earlier delete does not) — exact sequential semantics. Their index
    * signatures ride the same commit's incremental append. */
  final case class AddChunksOp(rows: DataFrame) extends Mutation

  private val log = LoggerFactory.getLogger(classOf[LibraryCatalog])
  private val writeLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private val obsSeq = new java.util.concurrent.atomic.AtomicLong()
  // WEAK keys: the registry must never pin a SparkSession (and its
  // listener) for the JVM's life — a session-per-tenant server or test
  // harness creating short-lived sessions would otherwise leak every
  // one of them. The listener itself dies with its session's
  // listenerManager; this set only dedups registration.
  private val observedSessions = java.util.Collections.synchronizedSet(
    java.util.Collections.newSetFromMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]()))

  /** Encodes the warning context in the observation name so the listener
    * can reconstruct it: `graft_underk|<lib>|<k>|<tagged>|<seq>`. */
  private[catalog] def underKObservationName(
      name: String, k: Int, tagged: Boolean): String =
    s"graft_underk|$name|$k|$tagged|${obsSeq.incrementAndGet()}"

  /** One listener per session, registered lazily: logs the T5 under-k
    * warning from the observed row count when a search query completes —
    * zero extra jobs. */
  private[catalog] def ensureUnderKListener(spark: SparkSession): Unit =
    if (observedSessions.add(spark)) {
      spark.listenerManager.register(
        new org.apache.spark.sql.util.QueryExecutionListener {
          override def onSuccess(
              funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              durationNs: Long): Unit =
            qe.observedMetrics.foreach { case (obsName, row) =>
              if (obsName.startsWith("graft_underk|")) {
                val parts = obsName.split("\\|")
                val (lib, k, tagged) = (parts(1), parts(2).toInt, parts(3).toBoolean)
                val n = row.getLong(0)
                if (n < k)
                  log.warn(s"search('$lib'): returning $n < k=$k results" +
                    (if (tagged) " (tag post-filter applied after top-k)" else ""))
              }
            }
          override def onFailure(
              funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              exception: Exception): Unit = ()
        })
    }
}
