package graft.sources

import java.util.{Map => JMap}

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.hadoop.io.Text
import org.apache.hadoop.util.LineReader
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.aggregate
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.{DataSourceRegister, Filter}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `spark.read.format("graft-jsonl")` — a full DataSourceV2 connector
  * for line-delimited JSON corpora, built on the public connector API
  * (`TableProvider` → `SupportsRead` → `ScanBuilder` → `Batch`):
  *
  *  - **Column pruning** (`SupportsPushDownRequiredColumns`): only the
  *    pruned columns (plus any filter-referenced ones) are extracted
  *    from each parsed line — `SELECT count(doc_id)` never materializes
  *    the text column.
  *  - **Filter pushdown** (`SupportsPushDownFilters`): =, <, <=, >, >=,
  *    IN, IS [NOT] NULL on top-level columns evaluate inside the reader
  *    BEFORE a row is built; everything else stays a Spark-side filter.
  *    Pushed filters appear in the scan description (spec-pinned), so
  *    `.explain` shows what reached the source — same discipline as the
  *    parquet `PushedFilters` audit.
  *  - **Byte-range splits**: files split at `splitSizeBytes` (default
  *    128 MB) with standard start-past-a-newline / read-through-the-
  *    boundary semantics, so a 100 TB corpus of large files fans out
  *    across executors instead of one task per file.
  *
  * Schema comes from the caller (`.schema(...)`, the explicit-schema
  * house rule) or from a ONE-LINE bounded inference (first data line of
  * the first file — never a full scan like `spark.read.json`'s
  * inference pass). Supported field types: string, long, int, double,
  * boolean (the chunk/document corpus shapes).
  *
  * Reference ingestion shape: `tests/chunks_test.csv`-style corpora
  * enter the catalog through [[ChunkSources]]; this connector is the
  * scale path for the same JSONL shape.
  */
class JsonlV2 extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-jsonl"

  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    JsonlV2.inferFromFirstLine(JsonlV2.pathOf(options))

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    // every option read goes through CaseInsensitiveStringMap — reader
    // options are case-insensitive everywhere else in Spark, so
    // .option("splitsizebytes", ...) must not be silently ignored
    val opts = new CaseInsensitiveStringMap(properties)
    JsonlTable(
      JsonlV2.pathOf(opts),
      schema,
      Option(opts.get("splitSizeBytes"))
        .map(_.toLong)
        .map { sb =>
          // a non-positive step makes every `(0L until len by sb)` split
          // range EMPTY — the scan would "succeed" with zero rows; fail
          // loudly like the mode option does
          require(sb > 0, s"graft-jsonl: splitSizeBytes must be positive, got $sb")
          sb
        }
        .getOrElse(JsonlV2.DefaultSplitBytes),
      {
        // Locale.ROOT: the default-locale toUpperCase turns "failfast"
        // into FAİLFAST under tr-TR and rejects a valid option — the
        // exact bug Spark's own option parsing pins the root locale for
        val mode = Option(opts.get("mode"))
          .map(_.toUpperCase(java.util.Locale.ROOT))
          .getOrElse("PERMISSIVE")
        // unsupported modes must fail loudly — silently coercing e.g.
        // DROPMALFORMED to PERMISSIVE would change row counts vs the
        // same read through spark.read.json
        require(mode == "PERMISSIVE" || mode == "FAILFAST",
          s"graft-jsonl: unsupported mode '$mode' (PERMISSIVE | FAILFAST)")
        mode == "FAILFAST"
      },
      Option(opts.get("unterminatedStablePolls")).map(_.toInt)
        .map { n =>
          require(n >= 2,
            s"graft-jsonl: unterminatedStablePolls must be >= 2, got $n")
          n
        }
        .getOrElse(JsonlV2.DefaultUnterminatedStablePolls),
      Option(opts.get("unterminatedStableMs")).map(_.toLong)
        .map { ms =>
          require(ms >= 0,
            s"graft-jsonl: unterminatedStableMs must be >= 0, got $ms")
          ms
        }
        .getOrElse(JsonlV2.DefaultUnterminatedStableMs))
  }
}

/** Serializable snapshot of the DRIVER's Hadoop conf, shipped inside
  * the reader/writer factories so executor-side file access sees every
  * `spark.hadoop.*` setting (credentials, endpoints, timeouts).
  * Executors have no SparkSession, so a session lookup there returns
  * classpath defaults — indistinguishable in local mode (same JVM, the
  * driver session is visible) and silently wrong on a real cluster.
  * Hadoop's Configuration is Writable, not Serializable; this wrapper
  * round-trips it through its own write/readFields (the same shape
  * Spark's internal SerializableConfiguration uses). */
class SerializableHConf(@transient var value: Configuration) extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}

object JsonlV2 {
  val DefaultSplitBytes: Long = 128L * 1024 * 1024

  /** An unterminated final line is only admitted as real data after its
    * raw length has been seen unchanged this many consecutive polls AND
    * for at least this long. Two-poll stability alone is not enough: a
    * fast trigger makes the window sub-second, so a writer stalled
    * mid-line for one scheduling hiccup would get its partial line
    * admitted — and the offset advance makes the tear permanent (the
    * head parses as garbage, the later tail as a second garbage row).
    * Both knobs are source options (`unterminatedStablePolls`,
    * `unterminatedStableMs`) so slow-writer deployments can raise them. */
  val DefaultUnterminatedStablePolls: Int = 3
  val DefaultUnterminatedStableMs: Long = 2000L

  /** DRIVER-side Hadoop conf for filesystem access: the active/default
    * session's `hadoopConfiguration` when one exists (so
    * `spark.hadoop.*` settings and credentials reach the connector,
    * like every built-in source), classpath defaults otherwise.
    * Executor-side readers/writers must NOT call this (no session
    * there on a real cluster) — they receive the driver's conf via
    * [[SerializableHConf]] in their factory. */
  private[sources] def hconf(): Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new Configuration())

  /** The shippable form of [[hconf]] for factory construction. */
  private[sources] def shippableConf(): SerializableHConf =
    new SerializableHConf(hconf())

  private[sources] def pathOf(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null && p.nonEmpty, "graft-jsonl needs a path option")
    p
  }

  /** Data files under `path` (itself a file, or a directory whose
    * non-hidden files are data). */
  private[sources] def listFiles(path: String): Seq[FileStatus] = {
    val p = new Path(path)
    val fs = p.getFileSystem(JsonlV2.hconf())
    val st = fs.getFileStatus(p)
    val files =
      if (st.isDirectory)
        fs.listStatus(p).toSeq
          .filter(f => f.isFile && !f.getPath.getName.startsWith("_") &&
            !f.getPath.getName.startsWith("."))
      else Seq(st)
    files.sortBy(_.getPath.toString)
  }

  /** Bounded inference: parse the FIRST non-blank line of the first
    * file — integral → long, fractional → double, boolean → boolean,
    * everything else → string. One driver read, never a corpus scan. */
  private[sources] def inferFromFirstLine(path: String): StructType = {
    val files = listFiles(path)
    require(files.nonEmpty, s"no data files under $path")
    val fs = files.head.getPath.getFileSystem(JsonlV2.hconf())
    val in = fs.open(files.head.getPath)
    try {
      val reader = new LineReader(in)
      val text = new Text()
      var line = ""
      while (line.trim.isEmpty && reader.readLine(text) > 0)
        line = text.toString
      require(line.trim.nonEmpty, s"${files.head.getPath} has no data line")
      val node = new ObjectMapper().readTree(line)
      val fields = node.properties().asScala.toSeq.map { e =>
        val dt = e.getValue match {
          case v if v.isIntegralNumber  => LongType
          case v if v.isFloatingPointNumber => DoubleType
          case v if v.isBoolean         => BooleanType
          case _                        => StringType
        }
        StructField(e.getKey, dt, nullable = true)
      }
      StructType(fields)
    } finally in.close()
  }

  /** Which of Spark's v1 filters the reader can evaluate. */
  private[sources] def supported(f: Filter): Boolean = f match {
    case _: sources.EqualTo | _: sources.GreaterThan |
        _: sources.GreaterThanOrEqual | _: sources.LessThan |
        _: sources.LessThanOrEqual | _: sources.In |
        _: sources.IsNull | _: sources.IsNotNull => true
    case _ => false
  }

  private[sources] def refs(f: Filter): Seq[String] = f.references.toSeq

  /** Evaluate a pushed filter against the parsed values (null = SQL
    * NULL semantics: comparisons with null are false). */
  private[sources] def eval(f: Filter, get: String => Any): Boolean = f match {
    case sources.IsNull(a)    => get(a) == null
    case sources.IsNotNull(a) => get(a) != null
    case sources.EqualTo(a, v) =>
      val x = get(a); x != null && cmp(x, v) == 0
    case sources.GreaterThan(a, v) =>
      val x = get(a); x != null && cmp(x, v) > 0
    case sources.GreaterThanOrEqual(a, v) =>
      val x = get(a); x != null && cmp(x, v) >= 0
    case sources.LessThan(a, v) =>
      val x = get(a); x != null && cmp(x, v) < 0
    case sources.LessThanOrEqual(a, v) =>
      val x = get(a); x != null && cmp(x, v) <= 0
    case sources.In(a, vs) =>
      val x = get(a); x != null && vs.exists(v => v != null && cmp(x, v) == 0)
    case other => throw new IllegalStateException(s"unsupported pushed filter $other")
  }

  /** Compare a parsed value with a Catalyst literal of the same column
    * type. Integral×integral compares through Long — a double round-trip
    * loses precision above 2^53, and a fully-pushed filter is REMOVED
    * from the Spark plan, so a reader-side rounding error would go
    * unchecked. Mixed float comparisons fall back to double; strings use
    * UTF8String order to match Spark's binary collation. */
  private[sources] def cmp(x: Any, v: Any): Int = (x, v) match {
    case (a: UTF8String, b: UTF8String) => a.compareTo(b)
    case (a: UTF8String, b: String)     => a.compareTo(UTF8String.fromString(b))
    case (a: Boolean, b: Boolean)       => java.lang.Boolean.compare(a, b)
    case (a: Number, b: Number) if isIntegral(a) && isIntegral(b) =>
      java.lang.Long.compare(a.longValue(), b.longValue())
    case (a: Number, b: Number)         => java.lang.Double.compare(a.doubleValue(), b.doubleValue())
    case _ => throw new IllegalStateException(
      s"incomparable pushed-filter operands: ${x.getClass} vs ${v.getClass}")
  }

  private def isIntegral(n: Number): Boolean = n match {
    case _: java.lang.Long | _: java.lang.Integer |
        _: java.lang.Short | _: java.lang.Byte => true
    case _ => false
  }

  // --------------------------------------------------- per-file zone maps

  /** Name of the per-file column-stats manifest the write half commits:
    * `{fileName: {col: [min, max]}}` for NUMERIC columns (strings are
    * excluded — UTF8String binary order and java String order disagree
    * on non-ASCII, so string zones could mis-prune). Read-side, a file
    * whose zone range provably excludes every pushed/runtime comparison
    * filter is skipped WHOLE at split-planning time — the JSONL analog
    * of parquet row-group statistics. */
  val ZonesFile = "_zones.json"

  private[sources] def readZones(
      path: String): Map[String, Map[String, (Double, Double)]] = {
    val p = new Path(path)
    val fs = p.getFileSystem(JsonlV2.hconf())
    val zp = new Path(p, ZonesFile)
    if (!fs.exists(zp)) return Map.empty
    // the manifest is an OPTIMIZATION: a garbled one (torn copy, manual
    // edit) must degrade to no-pruning — correct results from the data
    // files — never make an intact table unreadable
    try {
      val in = fs.open(zp)
      try {
        val node = new ObjectMapper().readTree(in)
        node.properties().asScala.map { e =>
          e.getKey -> e.getValue.properties().asScala.map { c =>
            c.getKey -> (c.getValue.get(0).asDouble(), c.getValue.get(1).asDouble())
          }.toMap
        }.toMap
      } finally in.close()
    } catch {
      case e: Exception =>
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"graft-jsonl: unreadable $ZonesFile under $path — zone pruning disabled: $e")
        Map.empty
    }
  }

  private[sources] def writeZones(
      path: String, zones: Map[String, Map[String, (Double, Double)]]): Unit = {
    val p = new Path(path)
    val fs = p.getFileSystem(JsonlV2.hconf())
    // write hidden, rename into place: the manifest becomes visible
    // atomically with its full contents (same discipline as the data
    // files' job commit — a crash mid-write leaves no partial manifest)
    val tmp = new Path(p, s".$ZonesFile.inprogress")
    val out = fs.create(tmp, true)
    val g = new com.fasterxml.jackson.core.JsonFactory()
      .createGenerator(out.asInstanceOf[java.io.OutputStream])
    g.writeStartObject()
    zones.toSeq.sortBy(_._1).foreach { case (f, cols) =>
      g.writeObjectFieldStart(f)
      cols.toSeq.sortBy(_._1).foreach { case (c, (mn, mx)) =>
        g.writeArrayFieldStart(c)
        g.writeNumber(mn); g.writeNumber(mx)
        g.writeEndArray()
      }
      g.writeEndObject()
    }
    g.writeEndObject()
    g.close()
    val dest = new Path(p, ZonesFile)
    fs.delete(dest, false)
    if (!fs.rename(tmp, dest))
      throw new java.io.IOException(s"graft-jsonl: rename $tmp -> $dest failed")
  }

  /** Pseudo-column in the zone manifest recording the file LENGTH at
    * job commit (min == max == length; file sizes are exact in double
    * far past any real file). Zone stats describe the file AS COMMITTED
    * — if an external writer appended to it afterwards, pruning on those
    * stats would skip rows the stats never saw (in a stream, permanently:
    * the offset still advances past them). [[zoneAppliesAt]] therefore
    * gates every zone consult on the snapshot length matching the
    * recorded one; manifests written before this key existed simply
    * never prune (conservative). Skipped for tables whose SCHEMA has a
    * real column of this name (no length recorded → no pruning). */
  val LenKey = "__len"

  /** Zone stats are only valid for the byte range they were committed
    * over: true iff the manifest recorded the file's commit length and
    * the snapshot length equals it. */
  private[sources] def zoneAppliesAt(
      z: Map[String, (Double, Double)], snapshotLen: Long): Boolean =
    z.get(LenKey).exists(_._1.toLong == snapshotLen)

  /** True when `f` provably matches NO row of a file with the given
    * numeric zone ranges. Missing column stats never prune (all-null or
    * non-numeric columns are conservative); comparison filters are
    * null-rejecting, so range disjointness is sufficient. The looked-up
    * range is widened by one ulp before testing: int64 stats round
    * through double (error ≤ 0.5 ulp), and a min that rounded UP must
    * never exclude an EqualTo at the true minimum. (Widening happens on
    * the single referenced column only — split planning calls this
    * per (file × filter) and must not rebuild whole-map copies.) */
  private[sources] def zoneExcludes(
      f: Filter, rawZones: Map[String, (Double, Double)]): Boolean = {
    def zone(c: String): Option[(Double, Double)] =
      rawZones.get(c).map { case (mn, mx) =>
        (mn - Math.ulp(mn), mx + Math.ulp(mx))
      }
    def num(v: Any): Option[Double] = v match {
      case n: Number => Some(n.doubleValue())
      case _         => None
    }
    f match {
      case sources.EqualTo(a, v) =>
        zone(a).zip(num(v)).exists { case ((mn, mx), d) => d < mn || d > mx }
      case sources.GreaterThan(a, v) =>
        zone(a).zip(num(v)).exists { case ((_, mx), d) => mx <= d }
      case sources.GreaterThanOrEqual(a, v) =>
        zone(a).zip(num(v)).exists { case ((_, mx), d) => mx < d }
      case sources.LessThan(a, v) =>
        zone(a).zip(num(v)).exists { case ((mn, _), d) => mn >= d }
      case sources.LessThanOrEqual(a, v) =>
        zone(a).zip(num(v)).exists { case ((mn, _), d) => mn > d }
      case sources.In(a, vs) =>
        zone(a).exists { case (mn, mx) =>
          vs.nonEmpty && vs.forall(v =>
            num(v).exists(d => d < mn || d > mx))
        }
      case _ => false
    }
  }
}

case class JsonlTable(
    path: String,
    tableSchema: StructType,
    splitBytes: Long,
    failFast: Boolean = false,
    stablePolls: Int = JsonlV2.DefaultUnterminatedStablePolls,
    stableMs: Long = JsonlV2.DefaultUnterminatedStableMs)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graft-jsonl:$path"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(
      TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new JsonlScanBuilder(path, tableSchema, splitBytes, failFast, stablePolls, stableMs)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new JsonlWriteBuilder(path, info.schema())
}

class JsonlScanBuilder(
    path: String,
    fullSchema: StructType,
    splitBytes: Long,
    failFast: Boolean = false,
    stablePolls: Int = JsonlV2.DefaultUnterminatedStablePolls,
    stableMs: Long = JsonlV2.DefaultUnterminatedStableMs)
    extends ScanBuilder
    with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns
    with SupportsPushDownLimit
    with SupportsPushDownAggregates {

  private var required: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty
  private var limit: Int = -1
  private var aggs: Option[Seq[JsonlAgg]] = None

  private def singleColumn(e: expressions.Expression): Option[String] =
    e match {
      case n: expressions.NamedReference if n.fieldNames().length == 1 =>
        Some(n.fieldNames()(0))
      case _ => None
    }

  /** PARTIAL aggregate pushdown (no grouping): COUNT(*) counts lines
    * without parsing JSON at all when no filters are pushed; COUNT/MIN/
    * MAX(col) parse only that field. Each split returns ONE partial row
    * and Spark's final aggregate merges — the 100 TB `SELECT count(*)`
    * stops being a full decode of the corpus. */
  override def pushAggregation(
      aggregation: aggregate.Aggregation): Boolean = {
    if (aggregation.groupByExpressions().nonEmpty) return false
    val parsed = aggregation.aggregateExpressions().toSeq.map {
      case _: aggregate.CountStar => Some(JsonlCountStar)
      case c: aggregate.Count if !c.isDistinct =>
        singleColumn(c.column).map(JsonlCount)
      case m: aggregate.Min =>
        singleColumn(m.column).map(n => JsonlMin(n, fullSchema(n).dataType))
      case m: aggregate.Max =>
        singleColumn(m.column).map(n => JsonlMax(n, fullSchema(n).dataType))
      case _ => None
    }
    if (parsed.exists(_.isEmpty)) false
    else { aggs = Some(parsed.flatten); true }
  }

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (sup, unsup) = filters.partition(JsonlV2.supported)
    pushed = sup
    unsup // Spark keeps evaluating these
  }

  override def pushedFilters(): Array[Filter] = pushed

  // partial pushdown (the default isPartiallyPushed = true): each split
  // stops parsing after `limit` surviving rows, Spark applies the
  // global limit on top
  override def pushLimit(n: Int): Boolean = { limit = n; true }

  override def build(): Scan =
    JsonlScan(path, fullSchema, required, pushed, splitBytes, limit, failFast, aggs,
      stablePolls, stableMs)
}

case class JsonlScan(
    path: String,
    fullSchema: StructType,
    required: StructType,
    pushed: Array[Filter],
    splitBytes: Long,
    limit: Int,
    failFast: Boolean = false,
    pushedAggs: Option[Seq[JsonlAgg]] = None,
    stablePolls: Int = JsonlV2.DefaultUnterminatedStablePolls,
    stableMs: Long = JsonlV2.DefaultUnterminatedStableMs)
    extends Scan with Batch with SupportsReportStatistics
    with SupportsRuntimeFiltering {

  // one LIST + one manifest read per Scan instance: the file set is
  // immutable within a plan, and estimateStatistics + planInputPartitions
  // (+ AQE re-asking for stats) would otherwise each pay a remote
  // metadata round-trip
  @transient private lazy val fileList = JsonlV2.listFiles(path)
  @transient private lazy val zoneMap = JsonlV2.readZones(path)

  /** Runtime (DPP-style) filters from a join's build side, applied
    * ROW-LEVEL: JSONL files carry no per-file statistics to prune
    * whole splits with, but the supported subset joins the pushed set
    * and drops rows during the parse — before anything is materialized
    * for the join. Correctness never depends on it (Spark keeps the
    * join); unsupported runtime predicates are ignored. */
  @transient private var runtime: Array[Filter] = Array.empty

  override def filterAttributes(): Array[expressions.NamedReference] =
    fullSchema.fields.map(f => expressions.Expressions.column(f.name))

  override def filter(filters: Array[Filter]): Unit =
    // an aggregated scan's partials must reflect exactly the STATIC
    // pushed filters Spark knows about — never narrow them at runtime
    if (pushedAggs.isEmpty) runtime = filters.filter(JsonlV2.supported)

  override def readSchema(): StructType = pushedAggs match {
    case None => required
    case Some(as) =>
      StructType(as.zipWithIndex.map {
        case (JsonlCountStar, i)   => StructField(s"agg_$i", LongType)
        case (JsonlCount(_), i)    => StructField(s"agg_$i", LongType)
        case (JsonlMin(_, dt), i)  => StructField(s"agg_$i", dt)
        case (JsonlMax(_, dt), i)  => StructField(s"agg_$i", dt)
      })
  }

  /** Bytes on disk under the path — enough for Catalyst/AQE to make
    * sane broadcast and shuffle decisions against this source instead
    * of falling back to the worst-case default size. */
  override def estimateStatistics(): Statistics = new Statistics {
    private val bytes = fileList.map(_.getLen).sum
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(bytes)
    override def numRows(): java.util.OptionalLong =
      java.util.OptionalLong.empty()
  }

  // surfaced in .explain — the V2 analog of parquet's PushedFilters line
  override def description(): String =
    s"graft-jsonl $path ReadSchema: ${required.simpleString}, " +
      s"PushedFilters: [${pushed.mkString(", ")}]" +
      (if (limit >= 0) s", PushedLimit: $limit" else "") +
      pushedAggs.map(a => s", PushedAggregation: [${a.mkString(", ")}]").getOrElse("")

  override def toBatch: Batch = this

  override def toMicroBatchStream(checkpointLocation: String): streaming.MicroBatchStream =
    new JsonlMicroBatchStream(path, fullSchema, required, pushed, splitBytes, failFast,
      stablePolls, stableMs)

  override def planInputPartitions(): Array[InputPartition] = {
    // zone pruning: a file whose committed numeric min/max provably
    // excludes every row under a pushed (or DPP runtime) comparison
    // filter contributes NO splits — whole-file skipping, the JSONL
    // analog of parquet row-group stats. Runtime filters arrive via
    // SupportsRuntimeFiltering BEFORE split planning, so a selective
    // join build side prunes files too.
    val active = pushed ++ runtime
    fileList.flatMap { f =>
      val len = f.getLen
      // stats are only trusted at the exact length they were committed
      // over — an externally-appended file must not be pruned on stats
      // that never saw its tail
      val skip = zoneMap.get(f.getPath.getName).exists(z =>
        JsonlV2.zoneAppliesAt(z, len) &&
          active.exists(JsonlV2.zoneExcludes(_, z)))
      if (len == 0 || skip) Nil
      else
        (0L until len by splitBytes).map { start =>
          JsonlSplit(f.getPath.toString, start,
            math.min(splitBytes, len - start),
            alignedStart = start == 0L)
        }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = pushedAggs match {
    case None =>
      JsonlReaderFactory(fullSchema, required, pushed ++ runtime, limit, failFast,
        JsonlV2.shippableConf())
    case Some(as) =>
      JsonlAggReaderFactory(fullSchema, as, pushed, failFast,
        JsonlV2.shippableConf())
  }
}

/** The supported pushed-aggregate shapes. */
sealed trait JsonlAgg extends Serializable
case object JsonlCountStar extends JsonlAgg { override def toString = "COUNT(*)" }
case class JsonlCount(col: String) extends JsonlAgg { override def toString = s"COUNT($col)" }
case class JsonlMin(col: String, dt: DataType) extends JsonlAgg { override def toString = s"MIN($col)" }
case class JsonlMax(col: String, dt: DataType) extends JsonlAgg { override def toString = s"MAX($col)" }

case class JsonlAggReaderFactory(
    fullSchema: StructType,
    aggs: Seq[JsonlAgg],
    pushed: Array[Filter],
    failFast: Boolean,
    conf: SerializableHConf = JsonlV2.shippableConf())
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new JsonlAggPartitionReader(
      p.asInstanceOf[JsonlSplit], fullSchema, aggs, pushed, failFast, conf.value)
}

/** One PARTIAL aggregate row per split. Pure COUNT(*) with no pushed
  * filters counts lines without touching Jackson at all; otherwise only
  * the referenced ∪ filtered fields parse per line. */
class JsonlAggPartitionReader(
    split: JsonlSplit,
    fullSchema: StructType,
    aggs: Seq[JsonlAgg],
    pushed: Array[Filter],
    failFast: Boolean,
    hc: Configuration = JsonlV2.hconf())
    extends PartitionReader[InternalRow] {

  private val neededCols: Array[String] =
    (aggs.collect {
      case JsonlCount(c)  => c
      case JsonlMin(c, _) => c
      case JsonlMax(c, _) => c
    } ++ pushed.flatMap(JsonlV2.refs)).distinct.toArray
  private val countOnly = neededCols.isEmpty && pushed.isEmpty

  // delegate the line/boundary discipline to the row reader over the
  // needed columns (empty required schema in the count-only case)
  private val inner = new JsonlPartitionReader(
    split, fullSchema,
    StructType(neededCols.map(n => fullSchema(fullSchema.fieldIndex(n)))),
    pushed, -1, failFast, hc)

  private var done = false
  private var row: InternalRow = _

  override def next(): Boolean = {
    if (done) return false
    var countStar = 0L
    val counts = new Array[Long](aggs.size)
    val minmax = new Array[Any](aggs.size)
    val colIdx = aggs.map {
      case JsonlCount(c)  => neededCols.indexOf(c)
      case JsonlMin(c, _) => neededCols.indexOf(c)
      case JsonlMax(c, _) => neededCols.indexOf(c)
      case JsonlCountStar => -1
    }.toArray
    while (inner.next()) {
      countStar += 1L
      if (!countOnly) {
        val r = inner.get()
        var i = 0
        while (i < aggs.size) {
          aggs(i) match {
            case JsonlCountStar => ()
            case JsonlCount(_) =>
              if (!r.isNullAt(colIdx(i))) counts(i) += 1L
            case JsonlMin(_, dt) =>
              val v = if (r.isNullAt(colIdx(i))) null else r.get(colIdx(i), dt)
              if (v != null && (minmax(i) == null ||
                  JsonlV2.cmp(v, minmax(i)) < 0)) minmax(i) = v
            case JsonlMax(_, dt) =>
              val v = if (r.isNullAt(colIdx(i))) null else r.get(colIdx(i), dt)
              if (v != null && (minmax(i) == null ||
                  JsonlV2.cmp(v, minmax(i)) > 0)) minmax(i) = v
          }
          i += 1
        }
      }
    }
    val out = new GenericInternalRow(aggs.size)
    aggs.zipWithIndex.foreach {
      case (JsonlCountStar, i)  => out.update(i, countStar)
      case (JsonlCount(_), i)   => out.update(i, counts(i))
      case (JsonlMin(_, _), i)  => out.update(i, minmax(i))
      case (JsonlMax(_, _), i)  => out.update(i, minmax(i))
    }
    row = out
    done = true
    true
  }

  override def get(): InternalRow = row
  override def close(): Unit = inner.close()
}

/** One byte range of one file. `alignedStart` marks a range start
  * KNOWN to be a line boundary (file start, or a streaming growth
  * offset) — no discard of a leading partial line; `strictEnd` marks a
  * range end at a streaming snapshot EOF — a line starting exactly at
  * the boundary belongs to the NEXT batch, not this split (the file may
  * have grown since the snapshot). */
case class JsonlSplit(
    file: String,
    start: Long,
    length: Long,
    alignedStart: Boolean = false,
    strictEnd: Boolean = false)
    extends InputPartition

case class JsonlReaderFactory(
    fullSchema: StructType,
    required: StructType,
    pushed: Array[Filter],
    limit: Int,
    failFast: Boolean = false,
    conf: SerializableHConf = JsonlV2.shippableConf())
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new JsonlPartitionReader(p.asInstanceOf[JsonlSplit], fullSchema, required,
      pushed, limit, failFast, conf.value)
}

/** Reads `[start, start+length)` of one file with standard line-split
  * semantics: a split that does not begin at byte 0 discards the
  * (partial) line in progress, and every split reads THROUGH its end
  * boundary to finish the line it started — each line is owned by
  * exactly one split. Only `required` ∪ filter-referenced fields are
  * extracted from the parsed tree; pushed filters run before the row
  * is built. */
class JsonlPartitionReader(
    split: JsonlSplit,
    fullSchema: StructType,
    required: StructType,
    pushed: Array[Filter],
    limit: Int = -1,
    failFast: Boolean = false,
    hc: Configuration = JsonlV2.hconf())
    extends PartitionReader[InternalRow] {

  private var emitted = 0L

  private val mapper = new ObjectMapper()
  private val hPath = new Path(split.file)
  private val in = hPath.getFileSystem(hc).open(hPath)
  private val reader = new LineReader(in)
  private val text = new Text()
  // bytes of the split consumed so far (counting from split.start)
  private var consumed = 0L
  private val filterCols: Array[String] =
    pushed.flatMap(JsonlV2.refs).distinct
  // (COUNT(*) fast path: when nothing needs extracting or filtering and
  // FAILFAST isn't on, a line IS a row — see the skip branch in next())
  // parse set = output columns ∪ filter columns, each with its declared type
  private val parseCols: Array[StructField] =
    (required.fields.map(_.name) ++ filterCols).distinct.map { n =>
      fullSchema(fullSchema.fieldIndex(n))
    }
  // fixed name→slot mapping + ONE reusable value buffer: the previous
  // shape allocated a fresh string-keyed HashMap per LINE (plus a
  // rehash per put) in the innermost scan loop — pure GC/CPU overhead
  // at corpus scale. The slot map is built once; per line the buffer is
  // null-filled and indexed.
  private val slotOf = {
    val m = new java.util.HashMap[String, Integer](parseCols.length * 2)
    parseCols.zipWithIndex.foreach { case (f, i) => m.put(f.name, i) }
    m
  }
  private val valBuf = new Array[Any](parseCols.length)
  private val getVal: String => Any = { n =>
    val i = slotOf.get(n)
    if (i == null) null else valBuf(i)
  }
  private val requiredSlots: Array[Int] =
    required.fields.map(f => slotOf.get(f.name).intValue())
  private var row: InternalRow = _

  locally {
    if (split.start > 0) {
      in.seek(split.start)
      if (!split.alignedStart)
        consumed += reader.readLine(text) // discard the partial line
    }
  }

  override def next(): Boolean = {
    if (limit >= 0 && emitted >= limit) return false
    // ownership rule (self-consistent with the seek-and-discard above):
    // a line STARTING at position p belongs to the split with
    // start < p <= start+length (first split: 0 <= p <= length) — the
    // line starting exactly at a boundary is read by the earlier split
    // and discarded by the later one
    while (if (split.strictEnd) consumed < split.length
           else consumed <= split.length) {
      val n = reader.readLine(text)
      if (n <= 0) return false
      consumed += n
      val line = text.toString
      if (line.trim.nonEmpty) {
        if (parseCols.isEmpty && pushed.isEmpty && !failFast) {
          row = JsonlPartitionReader.EmptyRow
          emitted += 1
          return true
        }
        // PERMISSIVE (default, spark.read.json parity): an unparseable
        // line becomes an all-null row — pushed IsNotNull/comparison
        // filters then drop it before a row is built. FAILFAST names
        // the file and offset.
        val node =
          try mapper.readTree(line)
          catch {
            case e: com.fasterxml.jackson.core.JacksonException if failFast =>
              throw new IllegalArgumentException(
                s"graft-jsonl FAILFAST: malformed JSON in ${split.file} " +
                  s"near byte ${split.start + consumed}: ${e.getMessage}")
            case _: com.fasterxml.jackson.core.JacksonException => null
          }
        var i = 0
        while (i < valBuf.length) { valBuf(i) = null; i += 1 }
        if (node != null) {
          i = 0
          while (i < parseCols.length) {
            val f = parseCols(i)
            valBuf(i) = JsonlPartitionReader.convert(node.get(f.name), f.dataType)
            i += 1
          }
        }
        if (pushed.forall(JsonlV2.eval(_, getVal))) {
          val out = new GenericInternalRow(required.length)
          i = 0
          while (i < required.length) {
            out.update(i, valBuf(requiredSlots(i)))
            i += 1
          }
          row = out
          emitted += 1
          return true
        }
      }
    }
    false
  }

  override def get(): InternalRow = row
  override def close(): Unit = reader.close()
}

object JsonlPartitionReader {
  private[sources] val EmptyRow = new GenericInternalRow(0)

  /** JSON node → Catalyst internal value of the declared type.
    * Type-STRICT: a field whose JSON type mismatches the declared type
    * becomes NULL, never a Jackson-coerced 0 / 0.0 / false — a
    * fabricated zero would satisfy pushed equality filters, poison
    * MIN/COUNT pushdowns, and look indistinguishable from real data.
    * (spark.read.json's PERMISSIVE nulls the whole record on a field
    * mismatch; this connector nulls the FIELD — strictly documented
    * divergence, and never a fabricated value either way. Numeric
    * widening int→double matches Spark.) */
  private[sources] def convert(node: JsonNode, dt: DataType): Any =
    if (node == null || node.isNull) null
    else dt match {
      case LongType =>
        if (node.isIntegralNumber && node.canConvertToLong) node.asLong() else null
      case IntegerType =>
        if (node.isIntegralNumber && node.canConvertToInt) node.asInt() else null
      case DoubleType  => if (node.isNumber) node.asDouble() else null
      case BooleanType => if (node.isBoolean) node.asBoolean() else null
      case StringType  =>
        UTF8String.fromString(if (node.isTextual) node.asText() else node.toString)
      case other =>
        throw new UnsupportedOperationException(s"graft-jsonl: unsupported type $other")
    }
}

/** The write half of the connector, following Spark's file-source
  * commit protocol: nothing becomes visible (and nothing pre-existing
  * is destroyed) until JOB commit.
  *
  *  - Each task streams its rows through a Jackson generator into a
  *    hidden `.part-<partition>-<task>.inprogress` file; task commit
  *    renames it to a hidden `.part-<partition>-<task>.staged` name and
  *    reports it to the driver. With Spark's commit coordinator (the
  *    default) at most one attempt per partition commits, so speculative
  *    or retried attempts never reach the staged set (task abort deletes
  *    the in-progress file).
  *  - `BatchWrite.commit` (driver, after EVERY task committed) performs
  *    the truncation for `mode("overwrite")` and then renames each
  *    staged file to its final visible `part-<partition>-<task>.jsonl`
  *    name. A job that dies mid-write therefore leaves the previous
  *    table contents fully intact — truncation is deferred, not eager.
  *  - `BatchWrite.abort` deletes every staged file named in the received
  *    commit messages, so failed jobs leave no hidden debris either. */
class JsonlWriteBuilder(path: String, schema: StructType)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = JsonlWrite(path, schema, doTruncate)
}

case class JsonlWrite(path: String, schema: StructType, doTruncate: Boolean)
    extends Write with BatchWrite {
  override def toBatch: BatchWrite = this

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory = {
    // driver-side, before any task runs: only ensure the directory
    // exists — truncation is DEFERRED to job commit so a failed
    // overwrite never loses the previous table contents
    val p = new Path(path)
    val fs = p.getFileSystem(JsonlV2.hconf())
    fs.mkdirs(p)
    // per-JOB unique token in every output name: two applications
    // appending to the same directory must never regenerate the same
    // part-<partition>-<task> names and silently overwrite each other's
    // files at job commit (Spark's own file sources embed a job UUID
    // for exactly this reason)
    JsonlWriterFactory(path, schema,
      java.util.UUID.randomUUID().toString.substring(0, 8),
      JsonlV2.shippableConf())
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val p = new Path(path)
    val fs = p.getFileSystem(JsonlV2.hconf())
    val staged = messages.collect { case m: JsonlStaged => m }
    if (doTruncate && fs.exists(p))
      JsonlV2.listFiles(path).foreach(f => fs.delete(f.getPath, false))
    staged.foreach { m =>
      val src = new Path(m.staged); val dst = new Path(m.dest)
      if (!fs.rename(src, dst))
        throw new java.io.IOException(s"graft-jsonl job commit: rename $src -> $dst failed")
    }
    // zone manifest: per-file numeric min/max collected by the task
    // writers, published atomically with the data at job commit —
    // overwrite replaces it, append merges with the surviving entries.
    // Each entry also records the file's COMMIT length (see LenKey):
    // the read side only trusts stats whose recorded length matches the
    // snapshot, so a file an external writer appended to afterwards is
    // never pruned on stats that predate its tail.
    val fresh = staged.map { m =>
      val dst = new Path(m.dest)
      val stats =
        if (schema.fieldNames.contains(JsonlV2.LenKey))
          // a REAL column of this name would be misread as the commit
          // length on the read side — record no stats at all for such
          // tables (no stats → no pruning; correctness over skipping)
          Map.empty[String, (Double, Double)]
        else {
          // length shipped by the task writer (one executor-side call
          // each), with a defensive driver-side fallback for a message
          // that predates the field — never a fabricated length
          val len =
            (if (m.length >= 0) m.length else fs.getFileStatus(dst).getLen).toDouble
          m.stats + (JsonlV2.LenKey -> (len, len))
        }
      dst.getName -> stats
    }.toMap
    val zones =
      if (doTruncate) fresh
      else JsonlV2.readZones(path) ++ fresh
    JsonlV2.writeZones(path, zones)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(path).getFileSystem(JsonlV2.hconf())
    messages.foreach {
      case m: JsonlStaged => fs.delete(new Path(m.staged), false)
      case _              => () // uncommitted tasks cleaned up in task abort
    }
  }
}

case class JsonlWriterFactory(
    path: String, schema: StructType, jobToken: String,
    conf: SerializableHConf = JsonlV2.shippableConf())
    extends DataWriterFactory {
  override def createWriter(
      partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new JsonlDataWriter(path, schema, partitionId, taskId, jobToken, conf.value)
}

class JsonlDataWriter(
    dir: String,
    schema: StructType,
    partitionId: Int,
    taskId: Long,
    jobToken: String,
    hc: Configuration = JsonlV2.hconf())
    extends DataWriter[InternalRow] {

  private val fs = new Path(dir).getFileSystem(hc)
  private val tmp = new Path(dir, s".part-$partitionId-$taskId-$jobToken.inprogress")
  private val staged = new Path(dir, s".part-$partitionId-$taskId-$jobToken.staged")
  private val dest = new Path(dir, s"part-$partitionId-$taskId-$jobToken.jsonl")
  private val out = fs.create(tmp, true)
  private val gen =
    new com.fasterxml.jackson.core.JsonFactory().createGenerator(
      out.asInstanceOf[java.io.OutputStream])

  // running numeric min/max per column for the zone manifest; a NaN
  // POISONS the column's stats for this file — NaN compares greater
  // than every number in Spark/eval semantics, so a [min,max] range
  // that silently excluded NaN rows could wrongly prune a file whose
  // NaN rows match a > / >= filter
  private val zMin = new Array[Double](schema.length)
  private val zMax = new Array[Double](schema.length)
  private val zSeen = new Array[Boolean](schema.length)
  private val zNaN = new Array[Boolean](schema.length)

  private def zUpdate(i: Int, v: Double): Unit = {
    if (!zSeen(i)) { zMin(i) = v; zMax(i) = v; zSeen(i) = true }
    else {
      if (v < zMin(i)) zMin(i) = v
      if (v > zMax(i)) zMax(i) = v
    }
  }

  override def write(row: InternalRow): Unit = {
    gen.writeStartObject()
    var i = 0
    while (i < schema.length) {
      val f = schema.fields(i)
      if (!row.isNullAt(i)) f.dataType match {
        case LongType =>
          val v = row.getLong(i); zUpdate(i, v.toDouble)
          gen.writeNumberField(f.name, v)
        case IntegerType =>
          val v = row.getInt(i); zUpdate(i, v.toDouble)
          gen.writeNumberField(f.name, v)
        case DoubleType =>
          val v = row.getDouble(i)
          if (v.isNaN) zNaN(i) = true else zUpdate(i, v)
          gen.writeNumberField(f.name, v)
        case BooleanType => gen.writeBooleanField(f.name, row.getBoolean(i))
        case StringType  => gen.writeStringField(f.name, row.getUTF8String(i).toString)
        case other => throw new UnsupportedOperationException(
          s"graft-jsonl write: unsupported type $other")
      }
      i += 1
    }
    gen.writeEndObject()
    gen.writeRaw('\n')
  }

  override def commit(): WriterCommitMessage = {
    gen.close()
    // task commit only STAGES (still hidden) — the job-level commit
    // performs the visible rename after every task has committed
    if (!fs.rename(tmp, staged))
      throw new java.io.IOException(s"rename $tmp -> $staged failed")
    val stats = schema.fields.indices.collect {
      case i if zSeen(i) && !zNaN(i) =>
        schema.fields(i).name -> (zMin(i), zMax(i))
    }.toMap
    // the file length rides in the commit message: the zone manifest
    // needs it (LenKey), and measuring it HERE is one executor-side
    // call per task — measured at the driver it was one SEQUENTIAL
    // getFileStatus round-trip per file inside job commit, lengthening
    // the only window where a driver crash can leave a torn table
    JsonlStaged(staged.toString, dest.toString, stats,
      fs.getFileStatus(staged).getLen)
  }

  override def abort(): Unit = {
    try gen.close() catch { case _: Throwable => () }
    fs.delete(tmp, false)
  }

  override def close(): Unit = ()
}

case class JsonlStaged(
    staged: String,
    dest: String,
    stats: Map[String, (Double, Double)] = Map.empty,
    length: Long = -1L)
    extends WriterCommitMessage

/** Streaming (micro-batch) read of a JSONL directory: the offset is the
  * per-file byte length at snapshot time, so each batch reads exactly
  * the files (or line-aligned file growth) that appeared since the last
  * committed offset — the standard file-source contract (files are
  * expected immutable once visible). Pushed filters, pruned columns,
  * and byte-range splits all apply per batch, reusing the batch
  * reader. */
class JsonlMicroBatchStream(
    path: String,
    fullSchema: StructType,
    required: StructType,
    pushed: Array[Filter],
    splitBytes: Long,
    failFast: Boolean = false,
    stablePolls: Int = JsonlV2.DefaultUnterminatedStablePolls,
    stableMs: Long = JsonlV2.DefaultUnterminatedStableMs)
    extends streaming.MicroBatchStream
    with streaming.SupportsTriggerAvailableNow {

  /** Last length per file KNOWN to end on a newline — the fallback an
    * unaligned snapshot clamps to (a writer may be mid-append when the
    * directory is listed). */
  @transient private val lastAligned =
    new scala.collection.concurrent.TrieMap[String, Long]

  /** Stability tracking per unterminated file: a file whose final byte
    * is not '\n' but whose raw length has been STABLE long enough is
    * complete (its producer just never wrote a trailing newline) —
    * admit it whole, or it would be invisible to the stream forever
    * while the batch reader returns its rows. "Long enough" =
    * unchanged across >= [[stablePolls]] consecutive snapshots AND for
    * >= [[stableMs]] wall-clock ms: two-poll stability alone admits a
    * torn line when a writer stalls mid-append across two fast-trigger
    * polls, and the offset advance makes the tear PERMANENT. A stalled
    * writer that outlasts both thresholds is indistinguishable from a
    * finished one by construction — the knobs bound the exposure, the
    * source options let slow-writer deployments widen them. */
  private case class UntermSeen(len: Long, firstSeenMs: Long, polls: Int)
  @transient private val lastRawUnterminated =
    new scala.collection.concurrent.TrieMap[String, UntermSeen]

  /** Offset snapshot with LINE-ALIGNMENT: a raw getLen taken while a
    * writer is mid-append would make this batch read through the torn
    * line's eventual newline and the next batch re-parse its tail as a
    * garbage row. One ranged 1-byte read per file checks the final
    * byte; a file not ending in '\n' is clamped back to its last known
    * aligned length (0 if never seen) — UNLESS its raw length is
    * unchanged since the previous snapshot, i.e. no writer is
    * appending: then the unterminated final line is real data and the
    * full length is admitted (the line reader parses a final line
    * without a trailing newline). NOTE these maps are in-memory only —
    * a restarted query re-learns them; [[latestOffset]] guards against
    * the resulting offset REGRESSION by never going below the
    * committed start. */
  private def snapshot(): JsonlStreamOffset = {
    val fs = new Path(path).getFileSystem(JsonlV2.hconf())
    JsonlStreamOffset(
      JsonlV2.listFiles(path).map { f =>
        val p = f.getPath
        val len = f.getLen
        val aligned =
          if (len == 0L) 0L
          else {
            val in = fs.open(p)
            try {
              in.seek(len - 1)
              if (in.read() == '\n'.toInt) {
                lastAligned.put(p.toString, len)
                lastRawUnterminated.remove(p.toString)
                len
              } else {
                val now = System.currentTimeMillis()
                lastRawUnterminated.get(p.toString) match {
                  case Some(seen) if seen.len == len
                      && seen.polls + 1 >= stablePolls
                      && now - seen.firstSeenMs >= stableMs =>
                    // unterminated but stable across enough polls and
                    // wall-clock: complete — admit the final line whole
                    lastAligned.put(p.toString, len)
                    lastRawUnterminated.remove(p.toString)
                    len
                  case Some(seen) if seen.len == len =>
                    lastRawUnterminated.put(
                      p.toString, seen.copy(polls = seen.polls + 1))
                    lastAligned.getOrElse(p.toString, 0L)
                  case _ =>
                    lastRawUnterminated.put(
                      p.toString, UntermSeen(len, now, 1))
                    lastAligned.getOrElse(p.toString, 0L)
                }
              }
            } finally in.close()
          }
        p.toString -> aligned
      }.toMap)
  }

  // Trigger.AvailableNow contract: pin the end offset ONCE at query
  // start; every batch drains toward that fixed snapshot and the query
  // stops there even if the directory keeps growing (without this,
  // Spark logs a fallback to single-batch execution)
  private var availableNowEnd: Option[JsonlStreamOffset] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowEnd = Some(snapshot())

  override def initialOffset(): streaming.Offset =
    JsonlStreamOffset(Map.empty)

  override def latestOffset(): streaming.Offset =
    availableNowEnd.getOrElse(snapshot())

  override def latestOffset(
      start: streaming.Offset,
      limit: streaming.ReadLimit): streaming.Offset = {
    // the end offset must NEVER regress below the committed start: the
    // alignment clamp falls back to an IN-MEMORY map, so right after a
    // query restart a mid-append file would clamp to 0 — Spark would
    // persist the regressed offset and the next batch would re-emit
    // rows the stream already delivered. A committed offset is always
    // line-aligned (it came from an aligned snapshot), so the
    // per-file max is safe.
    val s = start.asInstanceOf[JsonlStreamOffset].files
    val end = availableNowEnd.getOrElse(snapshot()).files
    JsonlStreamOffset((end.keySet ++ s.keySet).iterator.map { f =>
      f -> math.max(end.getOrElse(f, 0L), s.getOrElse(f, 0L))
    }.toMap)
  }

  override def reportLatestOffset(): streaming.Offset = snapshot()

  override def deserializeOffset(json: String): streaming.Offset =
    JsonlStreamOffset.fromJson(json)

  override def planInputPartitions(
      start: streaming.Offset, end: streaming.Offset): Array[InputPartition] = {
    val s0 = start.asInstanceOf[JsonlStreamOffset].files
    val s1 = end.asInstanceOf[JsonlStreamOffset].files
    // zone pruning (batch parity) — ONLY for a file read whole from
    // byte 0 AND whose snapshot length equals the manifest's recorded
    // commit length: the stats describe the file as it was at its job
    // commit, so applying them to a later GROWTH region (done > 0, or a
    // file an external writer appended to before the stream's first
    // read) could PERMANENTLY skip appended rows the stats never saw
    // while the offset still advances past them
    val zones = JsonlV2.readZones(path)
    s1.toSeq.sortBy(_._1).flatMap { case (file, len) =>
      val done = s0.getOrElse(file, 0L)
      val skip = done == 0L && zones.get(new Path(file).getName)
        .exists(z => JsonlV2.zoneAppliesAt(z, len) &&
          pushed.exists(JsonlV2.zoneExcludes(_, z)))
      if (len <= done || skip) Nil
      else (done until len by splitBytes).map { off =>
        val l = math.min(splitBytes, len - off)
        JsonlSplit(file, off, l,
          alignedStart = off == done,
          strictEnd = off + l == len)
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    JsonlReaderFactory(fullSchema, required, pushed, -1, failFast,
      JsonlV2.shippableConf())

  override def commit(end: streaming.Offset): Unit = ()
  override def stop(): Unit = ()
}

case class JsonlStreamOffset(files: Map[String, Long])
    extends streaming.Offset {
  override def json(): String = {
    val gen = new java.io.StringWriter()
    val g = new com.fasterxml.jackson.core.JsonFactory().createGenerator(gen)
    g.writeStartObject()
    files.toSeq.sortBy(_._1).foreach { case (f, l) => g.writeNumberField(f, l) }
    g.writeEndObject()
    g.close()
    gen.toString
  }
}

object JsonlStreamOffset {
  def fromJson(j: String): JsonlStreamOffset = {
    val node = new ObjectMapper().readTree(j)
    val b = Map.newBuilder[String, Long]
    node.properties().asScala.foreach(e => b += e.getKey -> e.getValue.asLong())
    JsonlStreamOffset(b.result())
  }
}
