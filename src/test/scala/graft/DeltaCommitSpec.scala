package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll

import graft.catalog.LibraryCatalog
import graft.catalog.Models._

/** The O(delta) mutation claims, DEMONSTRATED on disk — not just
  * designed: bucket-pruned reads (a point mutation lists only its
  * bucket's leaf dirs), O(delta) index parts (an append's index part
  * holds only the appended ids), tombstone deletes (no index rewrite),
  * carry-forward (a metadata mutation writes zero index bytes), and
  * deletion-vector reconciliation across delete→re-add of the same id.
  */
class DeltaCommitSpec extends SparkSpec with BeforeAndAfterAll {

  private lazy val warehouse =
    Files.createTempDirectory("graft-delta-").toString
  private lazy val catalog = new LibraryCatalog(spark, warehouse)

  private def chunkRows(ids: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    ids.toDF("id", "text")
      .withColumn("document_id", concat(lit("doc-"), col("id")))
  }

  private def libRoot = new java.io.File(s"$warehouse/dlib")

  private def versionDirs: Seq[String] =
    libRoot.listFiles().map(_.getName).filter(_.startsWith("v")).sorted.toSeq

  private def refsOf(vname: String): Map[String, Seq[String]] = {
    val f = new java.io.File(libRoot, s"$vname/artifacts.txt")
    if (!f.exists()) Map.empty
    else {
      val src = scala.io.Source.fromFile(f, "UTF-8")
      try src.getLines().filter(_.contains("=")).map { line =>
        val Array(a, dirs) = line.split("=", 2)
        a -> dirs.split(",").filter(_.nonEmpty).toSeq
      }.toMap
      finally src.close()
    }
  }

  override def beforeAll(): Unit = {
    super.beforeAll()
    // explicit bucket count: the pruning tests below need a multi-bucket
    // layout, and AutoBuckets (correctly) gives a KB fixture one bucket
    catalog.createLibrary("dlib", LshIndexer,
      chunkRows((0 until 64).map(i => (s"c$i", s"some document text $i"))),
      overwrite = true, numBuckets = 8)
  }

  test("append commits an index part holding ONLY the appended ids") {
    val v0 = versionDirs.max
    catalog.addChunks("dlib", chunkRows(Seq(("x1", "appended one"), ("x2", "appended two"))))
    val v1 = versionDirs.max
    assert(v1 > v0)
    // the new version's index part contains exactly the delta's rows
    val part = spark.read.parquet(s"${libRoot}/$v1/index")
    val partIds = part.select("id").distinct().collect().map(_.getString(0)).toSet
    assert(partIds === Set("x1", "x2"))
    // and the refs list EXTENDED rather than repointed
    assert(refsOf(v1)("index") === Seq(v0, v1))
    // no tombstones were written for a pure append
    assert(!new java.io.File(libRoot, s"$v1/index_deletes").exists())
  }

  /** Tombstone ids of a version, whichever form the commit chose:
    * driver-inlined ids.txt (small deletes) or a parquet part. */
  private def tombstoneIds(v: String): Seq[String] = {
    val inline = new java.io.File(libRoot, s"$v/index_deletes/ids.txt")
    if (inline.exists())
      scala.io.Source.fromFile(inline, "UTF-8").getLines().toSeq
    else
      spark.read.parquet(s"${libRoot}/$v/index_deletes")
        .collect().map(_.getString(0)).toSeq
  }

  test("delete writes a tombstone part, not a rewritten index") {
    val before = versionDirs.max
    catalog.deleteChunks("dlib", Seq("c3"))
    val v = versionDirs.max
    // tombstone exists, holds exactly the deleted id, and a point delete
    // writes it INLINE from the driver — no Spark job for one id
    assert(new java.io.File(libRoot, s"$v/index_deletes/ids.txt").exists(),
      "a driver-known small delete must inline its tombstone")
    assert(tombstoneIds(v) === Seq("c3"))
    // no index part was written in this version (no rewrite)
    assert(!new java.io.File(libRoot, s"$v/index").exists())
    assert(refsOf(v)("index") === refsOf(before)("index"))
    // and the LOGICAL index no longer contains the id
    val idx = catalog.indexTable("dlib").get
    assert(idx.where(col("id") === "c3").isEmpty)
    assert(idx.where(col("id") === "c4").count() > 0)
  }

  test("metadata-only mutation carries every artifact forward by reference") {
    val before = versionDirs.max
    val refsBefore = refsOf(before)
    catalog.updateMetadataWhere("dlib", col("id") === "c5",
      struct(
        lit("relabeled").as("source"),
        lit(null).cast("timestamp").as("created_at"),
        array(lit("t")).as("tags"),
        lit(null).cast("string").as("author"),
        lit(null).cast("string").as("title"),
        lit(null).cast("string").as("description"),
        lit(null).cast("int").as("page")))
    val v = versionDirs.max
    assert(refsOf(v) === refsBefore, "artifact refs must be untouched")
    assert(!new java.io.File(libRoot, s"$v/index").exists())
    assert(!new java.io.File(libRoot, s"$v/index_deletes").exists())
  }

  test("same-commit delete+append (updateChunk) keeps the re-added rows") {
    catalog.updateChunk("dlib", "c7", newText = Some("entirely new text"))
    val v = versionDirs.max
    // the commit wrote BOTH a fresh part for c7 and a tombstone for c7
    val part = spark.read.parquet(s"${libRoot}/$v/index")
    assert(part.select("id").distinct().collect().map(_.getString(0)).toSet === Set("c7"))
    assert(tombstoneIds(v) === Seq("c7"))
    // reconciliation: exactly ONE signature set per table for c7 — the
    // new one (old part rows dropped, same-version part rows kept)
    val idx = catalog.indexTable("dlib").get
    val perTable = idx.where(col("id") === "c7")
      .groupBy("table_idx").agg(count(lit(1)).as("n"))
      .select(max("n")).head().getLong(0)
    assert(perTable === 1L, "old and new sig rows must not coexist")
    // and the new signatures match a from-scratch rebuild bit-for-bit
    val live = idx.select("id", "table_idx", "sig")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).sortBy(_.toString())
    catalog.rebuildIndex("dlib")
    val rebuilt = catalog.indexTable("dlib").get.select("id", "table_idx", "sig")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).sortBy(_.toString())
    assert(live.sameElements(rebuilt))
  }

  test("rebuildIndex compacts index refs without touching chunk data") {
    // the rebuild in the previous test wrote a version with index
    // artifacts ONLY: one compacted index ref, no tombstones, and —
    // crucially — NO chunks dir (a rebuild must never rewrite the
    // corpus; at 100 TB that is the difference between O(index) and
    // O(data))
    val v = versionDirs.max
    assert(refsOf(v)("index") === Seq(v), "refs must compact to the rebuild")
    assert(!refsOf(v).contains("index_deletes"))
    assert(!new java.io.File(libRoot, s"$v/chunks").exists(),
      "rebuild must not rewrite chunk data")
    // the carried-forward manifest still reads back whole
    assert(catalog.chunks("dlib").count() === 65) // 64 created + 2 added - 1 deleted
  }

  test("point mutation reads only its bucket's leaf dirs (file-level pruning)") {
    // chunk leaves live in pre-rebuild versions (the manifest carries
    // them forward); collect the bucket dirs across all versions
    val buckets = versionDirs
      .map(v => new java.io.File(libRoot, s"$v/chunks"))
      .filter(_.exists())
      .flatMap(_.listFiles().map(_.getName).filter(_.startsWith("__b=")))
      .distinct.sorted
    assert(buckets.length > 1, "need multiple buckets to demonstrate pruning")
    // updateChunk(c9) must list ONLY c9's bucket leaf: assert via the
    // inputFiles of the df the catalog builds for that bucket — we
    // reproduce it through chunks() equality: after the update, the new
    // version's chunks/ contains exactly ONE bucket dir (the rewritten
    // one), proving the commit touched one bucket
    catalog.updateChunk("dlib", "c9", newText = Some("post-compaction text"))
    val v = versionDirs.max
    val written = new java.io.File(libRoot, s"$v/chunks")
      .listFiles().map(_.getName).filter(_.startsWith("__b="))
    assert(written.length === 1, s"one bucket rewritten, got: ${written.mkString(",")}")
    // and the library still reads back whole
    assert(catalog.chunks("dlib").count() === 65) // 64 created + 2 added - 1 deleted
  }

  test("pruned probe survives multi-part + tombstone reconciliation") {
    // state from the previous tests: a compacted part + an updateChunk
    // part, with a tombstone — the exact shape a probe sees between
    // rebuilds. Pushdown must reach EVERY part scan through the
    // reconciliation join.
    val refs = refsOf(versionDirs.max)
    assert(refs("index").length === 2, s"want 2 index parts, got $refs")
    assert(refs("index_deletes").nonEmpty)
    val idx = catalog.indexTable("dlib").get
    val plan = idx.where(col("table_idx") === 0 && col("sig") === 42L)
      .queryExecution.executedPlan.toString
    val partitionPruned =
      "PartitionFilters: \\[isnotnull\\(table_idx".r.findAllIn(plan).length
    assert(partitionPruned === 2,
      s"every index part scan must be partition-pruned on table_idx:\n$plan")
    assert(plan.contains("PushedFilters: [IsNotNull(sig), EqualTo(sig,"),
      s"sig equality not pushed into the part scans:\n$plan")
    // the updated chunk ranks by its NEW signatures only
    val c9 = idx.where(col("id") === "c9")
      .groupBy("table_idx").count().select(max("count")).head().getLong(0)
    assert(c9 === 1L)
  }

  test("a foreign claim on the next version fails the mutation loudly") {
    // simulate a concurrent writer from another process: pre-claim v+1
    val cur = versionDirs.max.stripPrefix("v").toLong
    val next = new java.io.File(libRoot, f"v${cur + 1}%06d")
    next.mkdirs()
    val claim = new java.io.File(next, "_claim")
    assert(claim.createNewFile())
    val ex = intercept[java.util.ConcurrentModificationException] {
      catalog.addChunks("dlib", chunkRows(Seq(("cx", "conflicting write"))))
    }
    assert(ex.getMessage.contains("claimed"))
    // a STALE claim (old mtime, pointer never advanced) is reclaimed:
    // the same mutation now succeeds and takes over the version number
    assert(claim.setLastModified(System.currentTimeMillis() - 16L * 60 * 1000))
    catalog.addChunks("dlib", chunkRows(Seq(("cx", "conflicting write"))))
    assert(catalog.chunks("dlib").where(col("id") === "cx").count() === 1L)
  }

  test("concurrent same-process writers serialize and both commit") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val before = catalog.chunks("dlib").count()
    val writes = (1 to 4).map(i => Future {
      catalog.addChunks("dlib", chunkRows(Seq((s"par$i", s"parallel write $i"))))
    })
    Await.result(Future.sequence(writes), 120.seconds)
    assert(catalog.chunks("dlib").count() === before + 4)
  }

  test("time travel: the previous version reads back exactly as committed") {
    val m0 = catalog.readMeta("dlib").get
    val before = catalog.chunks("dlib").count()
    catalog.addChunks("dlib", chunkRows(Seq(("tt1", "time travel probe"))))
    // the current version sees the append; the previous one does not
    assert(catalog.chunks("dlib").count() === before + 1)
    val old = catalog.chunksAt("dlib", m0.version)
    assert(old.count() === before)
    assert(old.where(col("id") === "tt1").isEmpty)
    // a never-committed / GC'd version fails loudly
    intercept[IllegalArgumentException] {
      catalog.chunksAt("dlib", 9999L)
    }
  }

  test("describeLibrary reports the read-amplification counters") {
    val d = catalog.describeLibrary("dlib")
    assert(d.meta.version === catalog.readMeta("dlib").get.version)
    // the time-travel append above added a delta leaf and an index part
    // on top of the multi-part state from the earlier tests
    assert(d.chunkLeafDirs > 0)
    assert(d.maxLeavesPerBucket >= 2, s"append should stack a leaf: $d")
    assert(d.indexParts >= 2, s"append should add an index part: $d")
    // compaction collapses every counter back to the floor
    catalog.compactLibrary("dlib")
    val c = catalog.describeLibrary("dlib")
    assert(c.maxLeavesPerBucket === 1, s"post-compaction: $c")
    assert(c.indexParts === 1 && c.indexDeleteParts === 0, s"post-compaction: $c")
  }

  test("over-split writes take the clustered shuffle path with bounded files per dir") {
    // the size gate reads spark.sql.files.maxPartitionBytes: shrink it
    // so this corpus counts as "large" and the clustered-shuffle write
    // branch — otherwise unreachable at test scale — actually executes
    val key = "spark.sql.files.maxPartitionBytes"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "64")
      catalog.createLibrary("biglib", LshIndexer,
        chunkRows((0 until 64).map(i => (s"b$i", s"clustered write text $i"))),
        overwrite = true)
      catalog.addChunks("biglib",
        chunkRows((64 until 96).map(i => (s"b$i", s"clustered append text $i"))))
      assert(catalog.chunks("biglib").count() === 96L)
      // clustering bounds output at WriteSaltFiles (=1) parquet file per
      // bucket dir per commit — without the shuffle every writer task
      // would emit a file into every dir
      val bigRoot = new java.io.File(s"$warehouse/biglib")
      bigRoot.listFiles().filter(_.getName.startsWith("v")).foreach { v =>
        val chunksDir = new java.io.File(v, "chunks")
        if (chunksDir.exists()) {
          chunksDir.listFiles().filter(_.getName.startsWith("__b=")).foreach { b =>
            val files = b.listFiles().map(_.getName).filter(_.endsWith(".parquet"))
            assert(files.length <= 1,
              s"${v.getName}/${b.getName} has ${files.length} files: ${files.mkString(",")}")
          }
        }
      }
      catalog.deleteLibrary("biglib")
    } finally spark.conf.set(key, prev)
  }

  test("compactLibrary collapses the delta history to one full commit") {
    catalog.compactLibrary("dlib")
    val v = versionDirs.max
    // one leaf per bucket, all owned by the compaction version
    val mfFile = new java.io.File(libRoot, s"$v/manifest.txt")
    val src = scala.io.Source.fromFile(mfFile, "UTF-8")
    val owners = try src.getLines().filter(_.contains("="))
      .flatMap(_.split("=", 2)(1).split(",")).toSet
    finally src.close()
    assert(owners === Set(v), s"manifest must point every bucket at $v, got $owners")
    // index refs compacted, deletion vectors gone
    assert(refsOf(v)("index") === Seq(v))
    assert(!refsOf(v).contains("index_deletes"))
    // one compaction keeps what the PREVIOUS version still references
    // (in-flight readers of v-1 stay whole); a second consecutive full
    // commit references only itself, so the history collapses to
    // {vN, vN-1}
    catalog.compactLibrary("dlib")
    assert(versionDirs.size <= 2, s"versions on disk: ${versionDirs.mkString(",")}")
    // content is untouched by compaction (65 from the earlier tests + 1
    // claim-conflict chunk + 4 parallel-writer chunks + 1 time-travel
    // probe; the describeLibrary test compacted once already — a second
    // compaction of a compacted library is a no-op shape-wise)
    assert(catalog.chunks("dlib").count() === 71)
    assert(catalog.indexTable("dlib").get.where(col("id") === "c3").isEmpty)
    // GC'd history is not silently resurrectable: only {vN, vN-1}
    // survive compaction, so time travel to anything older fails loudly
    val live = versionDirs.map(_.stripPrefix("v").toLong).sorted
    intercept[IllegalArgumentException] {
      catalog.chunksAt("dlib", live.min - 1)
    }
    // while the retained previous version still reads back whole
    assert(catalog.chunksAt("dlib", live.min).count() > 0)
  }

  test("auto-compaction: a delta commit past the read-amplification bound folds the part lists back to one") {
    val wh = Files.createTempDirectory("graft-autocompact-").toString
    // tiny threshold so a handful of appends trips the policy
    val auto = new LibraryCatalog(spark, wh, autoCompactRefs = 4)
    auto.createLibrary("alib", LshIndexer,
      chunkRows(Seq(("a0", "seed row text"))), overwrite = true)
    def maxAmp(): Int = {
      val m = auto.readMeta("alib").get
      val root = new java.io.File(s"$wh/alib")
      val mf = new java.io.File(root, f"v${m.version}%06d/manifest.txt")
      val src = scala.io.Source.fromFile(mf, "UTF-8")
      val bucketAmp = try src.getLines().filter(_.contains("="))
        .map(_.split("=", 2)(1).split(",").count(_.nonEmpty)).maxOption.getOrElse(0)
      finally src.close()
      val af = new java.io.File(root, f"v${m.version}%06d/artifacts.txt")
      val asrc = scala.io.Source.fromFile(af, "UTF-8")
      val artAmp = try asrc.getLines().filter(_.contains("="))
        .map(_.split("=", 2)(1).split(",").count(_.nonEmpty)).maxOption.getOrElse(0)
      finally asrc.close()
      math.max(bucketAmp, artAmp)
    }
    // appends accumulate part lists... until the bound trips and a full
    // commit folds them; amplification must NEVER exceed threshold + 1
    (1 to 10).foreach { i =>
      auto.addChunks("alib", chunkRows(Seq((s"a$i", s"appended row $i"))))
      assert(maxAmp() <= 5, s"read amplification ${maxAmp()} after append $i")
    }
    // at least one auto-compaction happened: part lists are short again
    assert(maxAmp() <= 5)
    // and no rows were lost across the folds
    assert(auto.chunks("alib").count() === 11L)
    assert(auto.indexTable("alib").get.select("id").distinct().count() === 11L)

    // the one-commit retention contract survives auto-compaction: a
    // reader that planned over the PRE-mutation version must still read
    // after a single mutation CALL that internally commits twice
    // (bucket-rewriting delta + auto-compact) — the compaction commit
    // retains the pre-delta generation's referenced files (extraKeep)
    val wh2 = Files.createTempDirectory("graft-retention-").toString
    val ret = new LibraryCatalog(spark, wh2, autoCompactRefs = 4)
    ret.createLibrary("rlib", LshIndexer,
      chunkRows((0 to 9).map(i => (s"r$i", s"retention row $i"))),
      overwrite = true)
    (1 to 3).foreach(i => // index refs grow to 4 — at the threshold edge
      ret.addChunks("rlib", chunkRows(Seq((s"x$i", s"extra row $i")))))
    val pinned = ret.chunks("rlib") // plan references v0..v3 part dirs
    val vBefore = ret.readMeta("rlib").get.version
    // bucket-rewriting mutation: drops the old chunk dirs from the new
    // manifest AND pushes index refs past the threshold -> auto-compact
    ret.updateChunk("rlib", "r5", newText = Some("rewritten row five"))
    assert(ret.readMeta("rlib").get.version === vBefore + 2,
      "expected delta + auto-compaction commits")
    assert(pinned.count() === 13L,
      "pre-mutation reader lost files to the auto-compaction GC")
    assert(pinned.where(col("id") === "r5").head().getAs[String]("text")
      === "retention row 5") // the PINNED version's content, pre-update

    // threshold 0 disables: the same ingest accumulates parts untouched
    val off = new LibraryCatalog(spark, wh, autoCompactRefs = 0)
    off.createLibrary("olib", LshIndexer,
      chunkRows(Seq(("b0", "seed row text"))), overwrite = true)
    (1 to 6).foreach(i =>
      off.addChunks("olib", chunkRows(Seq((s"b$i", s"appended row $i")))))
    val m = off.readMeta("olib").get
    val mf = new java.io.File(s"$wh/olib/v${"%06d".format(m.version)}/manifest.txt")
    val src = scala.io.Source.fromFile(mf, "UTF-8")
    val amp = try src.getLines().filter(_.contains("="))
      .map(_.split("=", 2)(1).split(",").count(_.nonEmpty)).max
    finally src.close()
    assert(amp >= 6, s"disabled policy must not compact (amp=$amp)")
  }
}
