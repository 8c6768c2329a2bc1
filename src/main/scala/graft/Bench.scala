package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line for the driver to parse.
  *
  * Harness rules (round-1 verdict fixes):
  *  - materialize via the noop sink, not `.count()` — a count lets Catalyst
  *    prune projections/sorts, so split()/sort work would go untimed;
  *  - never swallow failures: a failed query is recorded with status and
  *    the process exits nonzero (a broken query must not *improve* the bench);
  *  - one untimed warm-up pass (JVM/codegen warm-up dominated the round-1
  *    first-query number: 8.05 s vs 0.99 s for an identical-shape query).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Probe-only override for the cross-JVM-residue A/B (SCALING.md): a
    // tmpfs value (/dev/shm/…) takes this JVM's shuffle scratch off the
    // disk FS entirely, so a pair run with it isolates whether the
    // predecessor's residue travels through FS state. Unset (the driver
    // and the gate never set it) Spark uses its default local dir.
    val localDir = sys.env.get("SPARK_GRAFT_LOCAL_DIR").filter(_.nonEmpty)
    val spark = localDir.foldLeft(SparkSession.builder())(
        (b, d) => b.config("spark.local.dir", d))
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // v2 commit: task files rename straight into the output dir (one
      // fs op instead of two per file) — the write paths here commit
      // many small parquet tables, and commit latency, not bandwidth,
      // dominates them
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      // local-mode IO floor: RawLocalFileSystem skips the .crc sibling
      // write per file (a real cluster fs has its own integrity story)
      .config("spark.hadoop.fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
      // a 100+-query surface compiles several codegen classes per query;
      // the default 100-entry class cache thrashes and recompiles every
      // re-execution (static conf, must be set before session build)
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      // size small reduce sides by BYTES, not local parallelism: the many
      // sub-64MB shuffles here otherwise schedule 32 tasks each, and task
      // overhead — not bandwidth — dominates them (this is the setting's
      // documented production recommendation; large shuffles still fan
      // out by bytes, so nothing changes at 100 TB)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // the timed surface: every oracle-checked query PLUS the bench-only
    // rows (real-decoder seam — self-checking in-job, no DuckDB oracle)
    val allQueries = SparkEntry.queries ++ SparkEntry.benchOnlyQueries

    def runOnce(name: String): Either[String, Unit] =
      try {
        allQueries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        Right(())
      } catch {
        case e: Throwable => Left(Option(e.getMessage).getOrElse(e.getClass.getName))
      }

    // Optional comma-separated query filter — program arg first (lets one
    // sbt session fork a FRESH JVM per query: `runMain graft.Bench q_x`,
    // the scale gate's isolation mode), else the env var (local
    // iteration). The driver sets neither, so the recorded sf0.1 bench
    // always covers everything.
    val only = args.headOption.filter(_.nonEmpty)
      .orElse(sys.env.get("SPARK_GRAFT_BENCH_ONLY"))
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val names = allQueries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    // a requested name that matches nothing is a FAILURE, not an empty
    // ok run: a renamed/typo'd entry in the scale gate's core list would
    // otherwise silently drop from the x100 record while the merged
    // line still greps as "ok" (advisor finding, round 13)
    val unknown = only.toSeq.flatMap(_ -- allQueries.keySet).sorted
    // median-of-N samples; validated once (a bad env value falls back to
    // 3, a sub-1 value clamps to 1 so the sample vector can't be empty)
    val nSamples = math.max(1,
      sys.env.get("SPARK_GRAFT_BENCH_SAMPLES")
        .flatMap(_.toIntOption).getOrElse(3))
    // Ambient-load stamps. load_before is the DISCRIMINATING one: it is
    // sampled before this process has run any query, so a high value is
    // ambient contention by definition. load_after necessarily includes
    // this bench's own 32-core work (on a quiet host it still reads near
    // the core count) — it is recorded for the delta/decay picture, not
    // as a cleanliness signal; "cores" rides along so readers can
    // normalize either stamp.
    def loadAvg: Double =
      java.lang.management.ManagementFactory
        .getOperatingSystemMXBean.getSystemLoadAverage
    val loadBefore = loadAvg

    // Fixed-work CPU calibration: a single-threaded arithmetic spin
    // timed before the warm-up and again before every pass. loadavg
    // stamps cannot see hypervisor STEAL (a ~2x window was recorded at
    // loadavg 1.6 — SCALING.md); the same fixed work drifting to 2x the
    // quiet-host time labels stolen/contended CPU quantitatively, per
    // pass, inside the record itself.
    def calibrate(): Double = {
      var x = 0x9E3779B97F4A7C15L
      var i = 0L
      val steps = 400000000L // ~0.75 s on an idle core of this host (measured)
      val t0 = System.nanoTime()
      while (i < steps) { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; i += 1 }
      val dt = (System.nanoTime() - t0) / 1e9
      // consume x so the JIT cannot eliminate the loop
      if (x == 42L) System.err.println("calib")
      dt
    }
    // Optional IO settle (round-14 verdict #3): the calibration spin is
    // CPU-only — it labels steal/contention but is BLIND to page-cache
    // writeback, and in the per-query-JVM x100 gate the previous query's
    // JVM leaves dirty shuffle/checkpoint pages whose flush steals IO
    // from this JVM's timed passes (measured: q_embed_neardup 93.6 s
    // in-gate vs 84.0 +/- 2.6 s solo at EQUAL calib). When
    // SPARK_GRAFT_IO_SETTLE is set, force the flush into untimed
    // positions: sync(2), then wait (bounded) until /proc/meminfo
    // Dirty+Writeback drops under the threshold — at JVM start
    // (previous query's residue), after the warm-up pass, and before
    // each timed pass (own residue). Total settle seconds and the final
    // dirty level are stamped into the record.
    val ioSettleOn = sys.env.get("SPARK_GRAFT_IO_SETTLE").exists(_.nonEmpty)
    val ioSettleKb = sys.env.get("SPARK_GRAFT_IO_SETTLE_KB")
      .flatMap(_.toLongOption).getOrElse(65536L)
    var ioSettleSec = 0.0
    var ioDirtyLastKb = -1L
    var ioSyncTimeouts = 0
    def dirtyKb(): Long =
      try {
        val src = scala.io.Source.fromFile("/proc/meminfo")
        try src.getLines()
          .filter(l => l.startsWith("Dirty:") || l.startsWith("Writeback:"))
          .map(_.split("\\s+")(1).toLong).sum
        finally src.close()
      } catch { case _: Throwable => -1L }
    def ioSettle(): Unit = if (ioSettleOn) {
      val t0 = System.nanoTime()
      // sync(1) itself must be time-bounded too: on a host where another
      // process keeps writing, an untimed waitFor() can block far past
      // the 30 s loop bound below and hang the gate inside an untimed
      // region with no diagnostic (round-15 advisor). Expired syncs are
      // killed and counted into the io stamp.
      try {
        val p = new ProcessBuilder("sync").start()
        if (!p.waitFor(60, java.util.concurrent.TimeUnit.SECONDS)) {
          p.destroyForcibly()
          ioSyncTimeouts += 1
        }
      } catch { case _: Throwable => () }
      var d = dirtyKb()
      // bounded: sync already blocked on the flush; this loop only
      // covers stragglers another process keeps dirtying
      var waitedMs = 0L
      while (d > ioSettleKb && waitedMs < 30000L) {
        Thread.sleep(500); waitedMs += 500; d = dirtyKb()
      }
      ioDirtyLastKb = d
      ioSettleSec += (System.nanoTime() - t0) / 1e9
    }
    ioSettle()
    val calibBefore = calibrate()
    val calibPasses = new scala.collection.mutable.ArrayBuffer[Double]

    // JSON numeric formatting is pinned to the ROOT locale: Scala's f
    // interpolator uses the JVM default, and under a comma-decimal
    // locale (tr-TR, de-DE) every interpolated double would corrupt
    // bench_full.json and the driver line.
    def num(v: Double, decimals: Int): String =
      String.format(java.util.Locale.ROOT, s"%.${decimals}f", Double.box(v))

    // Warm-up: run one representative query untimed (codegen + classloading).
    names.headOption.foreach(runOnce)
    ioSettle()

    var failed = unknown.map(n => s"$n: unknown query").toList
    // Per query: MEDIAN of N timed full materializations, with the
    // per-query SPREAD (max - min) recorded alongside — the ambient
    // host (shared VM, disk) adds multi-second noise that a single
    // sample conflates with engine cost (observed: identical builds
    // measuring 32 s and 50 s totals). The median is noise-robust and
    // every sample does the complete work; the recorded spread turns
    // "is this drift or a regression?" from a paragraph of forensics
    // into reading one number.
    //
    // Samples are INTERLEAVED (pass 1 runs every query, then pass 2,
    // then pass 3 — A/B/A), not back-to-back per query: ambient load
    // drifts on minute scales, so three adjacent samples of one query
    // all land inside the same slow window and the median faithfully
    // records the weather (round 10's spread_total was 46 s of a 68 s
    // total). Interleaving makes a slow window straddle a SLICE OF
    // EVERY QUERY in one pass; the per-query median across passes then
    // discards the drifted pass instead of averaging it in. One-time
    // costs (per-dir caches, demo libraries) warm in pass 1 exactly as
    // they warmed in sample 1 before — median semantics unchanged.
    //
    // The System.gc() releases orphaned localCheckpoint/cache blocks
    // left by the previous query (ContextCleaner frees them only after
    // a driver GC) so block-manager pressure doesn't bleed across
    // queries.
    val passTimes: Seq[Map[String, Double]] = (1 to nSamples).map { _ =>
      ioSettle()
      calibPasses += calibrate()
      names.map { name =>
        System.gc()
        val t0 = System.nanoTime()
        name -> (runOnce(name) match {
          case Right(_) => (System.nanoTime() - t0) / 1e9
          case Left(err) =>
            failed ::= s"$name: $err"
            -1.0
        })
      }.toMap
    }
    val sampled = names.map(name => name -> passTimes.map(_(name)))
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    val results = sampled.map { case (name, samples) =>
      name -> (if (samples.contains(-1.0)) -1.0 else median(samples))
    }
    // spread over the WARM passes only (with >= 3 samples): pass 1
    // carries each query's one-time costs by design — cache builds,
    // demo libraries, codegen — so including it made "spread" mostly
    // measure warmup, not weather. The cold surcharge is real
    // information but different information: it is reported separately
    // as cold_extra_total = Σ max(0, pass1 - median).
    val spreads = sampled.map { case (name, samples) =>
      val warm = if (samples.size >= 3) samples.drop(1) else samples
      name -> (if (samples.contains(-1.0)) -1.0 else warm.max - warm.min)
    }
    val coldExtra = sampled.collect {
      case (_, ss) if !ss.contains(-1.0) =>
        math.max(0.0, ss.head - median(ss))
    }.sum
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val totalSpread = spreads.collect { case (_, v) if v >= 0 => v }.sum
    val status = if (failed.isEmpty) "ok" else "failed"
    val loadAfter = loadAvg
    // cores is VALIDATED before interpolation: a padded or non-numeric
    // SPARK_GRAFT_CPUS would otherwise corrupt the one JSON line the
    // driver parses (and bench_full.json with it)
    val coresInt = cpus.trim.toIntOption.getOrElse(-1)
    // calib_before is the pre-anything quiet-point; calib_passes one
    // entry per sample pass — a pass whose calibration drifted from
    // calib_before by 2x ran under stolen/contended CPU and its samples
    // should be read accordingly (the median usually discards them).
    val calibJson = calibPasses.map(num(_, 3)).mkString("[", ",", "]")
    // io_settle_sec: UNTIMED seconds spent syncing+waiting out dirty
    // page-cache writeback (0.0 when the settle env is off);
    // io_dirty_kb: Dirty+Writeback at the last settle point — a large
    // value here means the bounded wait gave up and the passes ran over
    // live writeback after all.
    // io_sync_timeouts: sync(1) calls killed at the 60 s bound — nonzero
    // means another process was writing hard enough that the settle
    // never converged; read the record's spreads with that in mind.
    val ioStamp =
      if (ioSettleOn) s""""io_settle_sec":${num(ioSettleSec, 1)},"io_dirty_kb":$ioDirtyLastKb,"io_sync_timeouts":$ioSyncTimeouts,""" else ""
    val loadStamp =
      s"""$ioStamp"cold_extra_total":${num(coldExtra, 3)},"load_before":${num(loadBefore, 2)},"load_after":${num(loadAfter, 2)},"calib_before":${num(calibBefore, 3)},"calib_passes":$calibJson,"cores":$coresInt"""

    // Full-precision, full-map record: stderr (for humans) and
    // bench_full.json (for tools/the judge). This is NOT the driver line.
    // "queries" carries the per-query medians, "spread" the per-query
    // (max - min) over the same samples.
    //
    // FILTERED runs (scale-gate per-query JVMs, solo probes) write
    // bench_full_filtered.json instead: the committed bench_full.json
    // is the sf0.1 FULL-surface record, and every ad-hoc single-query
    // probe used to clobber it (two restore commits in round 15 alone;
    // the scale gate needed a backup/EXIT-trap dance around it).
    val fullPath =
      if (only.isDefined) "bench_full_filtered.json" else "bench_full.json"
    val fullQs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val fullSp = spreads.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val fullJson =
      s"""{"metric":"total","value":$total,"unit":"sec","stat":"median_of_$nSamples","sampling":"interleaved_passes","queries":$fullQs,"spread":$fullSp,"spread_total":$totalSpread,$loadStamp,"sf":"$sfDir","status":"$status","n_failed":${failed.size}}"""
    System.err.println(fullJson)
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(fullPath),
      (fullJson + "\n").getBytes("UTF-8"))
    catch { case _: Throwable => () }

    // Driver line: the driver parses a JSON object out of the LAST 2000
    // captured characters, and sbt appends a ~75-char "[success]" line
    // after us — a full 100+-query map at double precision is >2.5 KB and
    // got the round-5 record truncated to unparseable. Emit 3-decimal
    // values and cap the map (slowest queries first, the informative end)
    // so line + sbt suffix always fit; `queries_omitted` says what was
    // dropped and bench_full.json carries it.
    val lineBudget = 1750
    val slowestFirst = results.sortBy { case (_, v) => -v }
    val entries = slowestFirst.map { case (k, v) => "\"" + k + "\":" + num(v, 3) }
    val suffix =
      s""""stat":"median_of_$nSamples","spread_total":${num(totalSpread, 3)},$loadStamp,"sf":"$sfDir","status":"$status","n_failed":${failed.size},"n_queries":${results.size},"queries_omitted":"""
    val fixed = s"""{"metric":"total","value":${num(total, 3)},"unit":"sec","queries":{},""".length +
      suffix.length + 4
    val kept = new scala.collection.mutable.ArrayBuffer[String]
    var used = fixed
    entries.foreach { e =>
      if (used + e.length + 1 <= lineBudget) { kept += e; used += e.length + 1 }
    }
    val omitted = results.size - kept.size
    println(
      s"""{"metric":"total","value":${num(total, 3)},"unit":"sec","queries":${kept.mkString("{", ",", "}")},$suffix$omitted}""")
    failed.reverse.foreach(f => System.err.println(s"[bench] FAILED $f"))
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
