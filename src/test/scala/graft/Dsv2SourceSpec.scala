package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The graft-jsonl DataSourceV2 connector: result fidelity vs the
  * built-in JSON reader, filter pushdown + column pruning visible in
  * the scan, byte-range split exactness, and Spark-side residuals for
  * unsupported predicates. */
class Dsv2SourceSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docsSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  private lazy val jsonlDir: String = {
    val out = Files.createTempDirectory("dsv2src").toString + "/docs"
    spark.read.parquet(s"$sfDir/documents.parquet").write.json(out)
    out
  }

  private def v2(schema: StructType = docsSchema): DataFrame =
    spark.read.format("graft-jsonl").schema(schema).load(jsonlDir)

  private def planOf(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("type-mismatched fields read as NULL, never Jackson-coerced zeros") {
    // {"n":"abc"} under schema n LONG used to surface as n=0 via
    // Jackson's asLong coercion — a fabricated value that satisfied
    // pushed n=0 filters and poisoned MIN/COUNT. It must be NULL.
    val dir = Files.createTempDirectory("dsv2coerce").toString + "/t"
    val f = new java.io.File(dir); f.mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/a.jsonl"),
      """{"n":"abc","d":"x","b":7,"s":5}
        |{"n":3,"d":1.5,"b":true,"s":"ok"}
        |{"n":2.9,"d":4,"b":false,"s":"y"}
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("n", LongType), StructField("d", DoubleType),
      StructField("b", BooleanType), StructField("s", StringType)))
    val rows = spark.read.format("graft-jsonl").schema(schema).load(dir)
      .orderBy("s").collect()
    assert(rows.length === 3)
    // row s="5": every typed field mismatched -> null (s itself is the
    // documented convenience: non-textual nodes read as their JSON text)
    val bad = rows.find(_.getAs[String]("s") == "5").get
    assert(bad.isNullAt(0) && bad.isNullAt(1) && bad.isNullAt(2))
    // n declared LONG with JSON 2.9 -> null (no silent truncation to 2)
    val frac = rows.find(_.getAs[String]("s") == "y").get
    assert(frac.isNullAt(0))
    assert(frac.getAs[Double]("d") === 4.0, "int->double widening allowed")
    val good = rows.find(_.getAs[String]("s") == "ok").get
    assert(good.getAs[Long]("n") === 3L && good.getAs[Boolean]("b"))
    // and a pushed n = 0 filter matches NOTHING (no fabricated zeros)
    assert(spark.read.format("graft-jsonl").schema(schema).load(dir)
      .where(col("n") === 0L).count() === 0L)
  }

  test("reads exactly what the built-in json reader reads") {
    val builtin = spark.read.schema(docsSchema).json(jsonlDir)
      .orderBy("doc_id").collect().toSeq
    val ours = v2().orderBy("doc_id").collect().toSeq
    assert(ours === builtin)
    assert(ours.nonEmpty)
  }

  test("supported filters push into the scan; unsupported stay Spark-side") {
    val df = v2().where(col("lang") === "en" && col("n_chars") >= 200)
    val plan = planOf(df)
    assert(plan.contains("EqualTo(lang,en)"), plan)
    assert(plan.contains("GreaterThanOrEqual(n_chars,200)"), plan)
    val expected = spark.read.schema(docsSchema).json(jsonlDir)
      .where(col("lang") === "en" && col("n_chars") >= 200)
      .orderBy("doc_id").collect().toSeq
    assert(df.orderBy("doc_id").collect().toSeq === expected)

    // a predicate the source can't evaluate stays a Spark filter and
    // still yields the right answer
    val hard = v2().where(col("lang") === "en" && length(col("text")) > 500)
    val hardPlan = planOf(hard)
    assert(hardPlan.contains("EqualTo(lang,en)"), hardPlan)
    assert(hardPlan.contains("Filter"), hardPlan)
    val hardExpected = spark.read.schema(docsSchema).json(jsonlDir)
      .where(col("lang") === "en" && length(col("text")) > 500)
      .count()
    assert(hard.count() === hardExpected)
  }

  test("column pruning reaches the scan's ReadSchema") {
    val df = v2().where(col("lang") === "en").select("doc_id")
    val plan = planOf(df)
    assert(plan.contains("ReadSchema: struct<doc_id:bigint>"), plan)
    // filter-referenced column is parsed for evaluation but not output
    assert(df.columns.toSeq === Seq("doc_id"))
    assert(df.count() > 0)
  }

  test("IN and IS NULL pushdown semantics") {
    val df = v2().where(col("lang").isin("en", "de"))
    assert(planOf(df).contains("In(lang"), planOf(df))
    val expected = spark.read.schema(docsSchema).json(jsonlDir)
      .where(col("lang").isin("en", "de")).count()
    assert(df.count() === expected)
    assert(v2().where(col("lang").isNull).count() ===
      spark.read.schema(docsSchema).json(jsonlDir)
        .where(col("lang").isNull).count())
  }

  test("byte-range splits partition one file without losing or duplicating lines") {
    val out = Files.createTempDirectory("dsv2split").toString + "/one.jsonl"
    val lines = (0 until 5000).map(i => s"""{"id":$i,"v":"x$i"}""")
    Files.write(java.nio.file.Paths.get(out),
      lines.mkString("\n").getBytes("UTF-8"))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType)))
    val df = spark.read.format("graft-jsonl").schema(schema)
      .option("splitSizeBytes", "4096")
      .load(out)
    assert(df.rdd.getNumPartitions > 4,
      s"expected many splits, got ${df.rdd.getNumPartitions}")
    val ids = df.select("id").as[Long].collect().sorted.toSeq
    assert(ids === (0L until 5000L))
  }

  test("write half: connector-written files read back identically; overwrite truncates") {
    val out = Files.createTempDirectory("dsv2write").toString + "/w"
    val src = spark.read.parquet(s"$sfDir/documents.parquet")
    src.write.format("graft-jsonl").mode("overwrite").save(out)
    // the built-in json reader must agree with our reader on our files
    val builtin = spark.read.schema(docsSchema).json(out)
      .orderBy("doc_id").collect().toSeq
    val viaOurs = spark.read.format("graft-jsonl").schema(docsSchema)
      .load(out).orderBy("doc_id").collect().toSeq
    assert(viaOurs === builtin)
    assert(viaOurs.map(_.getLong(0)) ===
      src.orderBy("doc_id").select("doc_id").as[Long].collect().toSeq)
    // overwrite truncates: write a 1-row frame on top, count must be 1
    src.limit(1).write.format("graft-jsonl").mode("overwrite").save(out)
    assert(spark.read.format("graft-jsonl").schema(docsSchema).load(out).count() === 1)
    // no in-progress temp files survive
    val leftovers = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".inprogress"))
    assert(leftovers.isEmpty, leftovers.mkString(","))
  }

  test("write half: job-level atomicity — task commit stages hidden, job commit publishes, job abort preserves prior data") {
    import graft.sources.JsonlWrite
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    val dir = Files.createTempDirectory("dsv2atomic").toString + "/t"
    val schema = StructType(Seq(StructField("id", LongType)))
    spark.range(3).write.format("graft-jsonl").mode("overwrite").save(dir)
    def visible(): Seq[Long] =
      spark.read.format("graft-jsonl").schema(schema).load(dir)
        .select("id").as[Long].collect().sorted.toSeq
    assert(visible() === Seq(0L, 1L, 2L))

    // drive the connector's write protocol directly (one task)
    def taskWrite(w: JsonlWrite, ids: Seq[Long]) = {
      val writer = w.createBatchWriterFactory(null).createWriter(0, 99L)
      val row = new GenericInternalRow(1)
      ids.foreach { i => row.update(0, i); writer.write(row) }
      writer.commit()
    }

    // overwrite whose JOB fails after the task committed: abort must
    // leave the previous table contents fully intact and remove the
    // staged file — eager truncation would have already lost the data
    val failed = JsonlWrite(dir, schema, doTruncate = true)
    val staged = taskWrite(failed, Seq(10L, 11L))
    assert(visible() === Seq(0L, 1L, 2L), "staged write must not be visible")
    failed.abort(Array(staged))
    assert(visible() === Seq(0L, 1L, 2L))
    assert(new java.io.File(dir).listFiles().forall(f =>
      !f.getName.contains("staged") && !f.getName.contains("inprogress")),
      "aborted job left hidden debris")

    // successful overwrite: job commit truncates and publishes atomically
    val ok = JsonlWrite(dir, schema, doTruncate = true)
    val m = taskWrite(ok, Seq(20L))
    assert(visible() === Seq(0L, 1L, 2L), "truncation must be deferred to job commit")
    ok.commit(Array(m))
    assert(visible() === Seq(20L))
  }

  test("zone maps: committed per-file stats skip whole files under a selective range filter") {
    val out = Files.createTempDirectory("dsv2zones").toString + "/z"
    val src = spark.read.parquet(s"$sfDir/documents.parquet")
    // range-clustered write → each file owns a contiguous doc_id range,
    // so the committed _zones.json can prove disjointness per file
    src.repartitionByRange(8, col("doc_id"))
      .write.format("graft-jsonl").mode("overwrite").save(out)
    assert(new java.io.File(out, "_zones.json").exists(),
      "job commit did not publish the zone manifest")
    val all = spark.read.format("graft-jsonl").schema(docsSchema).load(out)
    val full = all.rdd.getNumPartitions
    val filtered = all.where(col("doc_id") < 50)
    val planned = filtered.rdd.getNumPartitions
    assert(planned < full,
      s"zone pruning did not reduce splits: $planned of $full")
    // pruning must be invisible to results
    assert(filtered.select("doc_id").as[Long].collect().sorted.toSeq ===
      src.where(col("doc_id") < 50).select("doc_id").as[Long].collect().sorted.toSeq)
    // a filter on an UN-zoned column (string) must not prune
    assert(all.where(col("lang") === "en").count() ===
      src.where(col("lang") === "en").count())
  }

  test("zone pruning is invisible under randomized predicates, extremes, and nulls") {
    import spark.implicits._
    val rng = new scala.util.Random(20260814L)
    val rows = (0 until 400).map { i =>
      val k: java.lang.Long =
        if (i % 37 == 0) null
        else if (i % 23 == 0) Long.MaxValue - rng.nextInt(3)
        else if (i % 29 == 0) Long.MinValue + rng.nextInt(3)
        else rng.nextLong() % 1000000L
      val v: java.lang.Double =
        if (i % 17 == 0) null else rng.nextDouble() * 2e6 - 1e6
      (i.toLong, k, v)
    }
    val df = rows.toDF("rid", "k", "v")
    val out = Files.createTempDirectory("dsv2zprop").toString + "/p"
    df.repartitionByRange(7, col("k")).write.format("graft-jsonl")
      .mode("overwrite").save(out)
    val schema = StructType(Seq(
      StructField("rid", LongType), StructField("k", LongType),
      StructField("v", DoubleType)))
    val back = spark.read.format("graft-jsonl").schema(schema).load(out)
    val preds: Seq[org.apache.spark.sql.Column] = Seq(
      col("k") === Long.MaxValue, col("k") === Long.MinValue,
      col("k") > 500000L, col("k") <= -999999L, col("k") < 0L,
      col("k").isin(0L, Long.MaxValue, -42L),
      col("v") > 999999.0, col("v") <= -999999.5,
      col("k") > 100L && col("v") < 0.0) ++
      (1 to 8).map(_ => col("k") > (rng.nextLong() % 1000000L)) ++
      (1 to 4).map(_ => col("v") < (rng.nextDouble() * 2e6 - 1e6))
    preds.zipWithIndex.foreach { case (p, i) =>
      val got = back.where(p).select("rid").as[Long].collect().sorted.toSeq
      val want = df.where(p).select("rid").as[Long].collect().sorted.toSeq
      assert(got === want, s"predicate #$i changed results under zone pruning")
    }
  }

  test("zone maps prune the streaming read's splits too (batch parity)") {
    import graft.sources.{JsonlMicroBatchStream, JsonlStreamOffset}
    import org.apache.spark.sql.sources.LessThan
    val out = Files.createTempDirectory("dsv2zstream").toString + "/z"
    spark.read.parquet(s"$sfDir/documents.parquet")
      .repartitionByRange(8, col("doc_id"))
      .write.format("graft-jsonl").mode("overwrite").save(out)
    def splits(pushed: Array[org.apache.spark.sql.sources.Filter]): Int = {
      val ms = new JsonlMicroBatchStream(
        out, docsSchema, docsSchema, pushed, splitBytes = 1L << 20)
      ms.planInputPartitions(
        JsonlStreamOffset(Map.empty), ms.latestOffset()).length
    }
    val all = splits(Array.empty)
    val pruned = splits(Array(LessThan("doc_id", 50L)))
    assert(all === 8, s"expected 8 one-file splits, got $all")
    assert(pruned < all, s"streaming zone pruning did not fire: $pruned of $all")
  }

  test("streaming: an unterminated final line is admitted once stable, and a restarted stream's offset never regresses") {
    import graft.sources.{JsonlMicroBatchStream, JsonlStreamOffset}
    val out = Files.createTempDirectory("dsv2unterm").toString + "/u"
    new java.io.File(out).mkdirs()
    val f = new java.io.File(out, "part-0.jsonl")
    val w = new java.io.FileWriter(f)
    try w.write("{\"doc_id\":1}\n{\"doc_id\":2}") finally w.close() // no trailing \n
    val schema = StructType(Seq(StructField("doc_id", LongType)))
    // stablePolls=3, stableMs=0: the test drives polls explicitly and
    // pins the poll-count gate; the wall-clock gate is orthogonal
    val ms = new JsonlMicroBatchStream(out, schema, schema, Array.empty, 1L << 20,
      stablePolls = 3, stableMs = 0L)
    def files(o: org.apache.spark.sql.connector.read.streaming.Offset) =
      o.asInstanceOf[JsonlStreamOffset].files
    // first sight: the unterminated tail is indistinguishable from a
    // mid-append — clamped out entirely
    val o1 = ms.latestOffset(JsonlStreamOffset(Map.empty), null)
    assert(files(o1).values.sum === 0L)
    // second sight, length unchanged: still NOT admitted — two-poll
    // stability would tear a writer stalled mid-line across two fast
    // triggers, and the offset advance makes the tear permanent
    val o1b = ms.latestOffset(o1, null)
    assert(files(o1b).values.sum === 0L,
      "unterminated file admitted after only two polls")
    // third sight, length still unchanged: the file is complete —
    // admitted whole (previously it stayed invisible to the stream
    // FOREVER while the batch reader returned its rows)
    val o2 = ms.latestOffset(o1b, null)
    assert(files(o2).values.sum === f.length(),
      "stable unterminated file not admitted")
    val splits = ms.planInputPartitions(o1, o2)
    assert(splits.length === 1)
    // restart amnesia: a FRESH stream's in-memory alignment state is
    // empty, so its snapshot clamps back to 0 — the end offset must
    // still never regress below the committed start (a regressed offset
    // would re-emit already-delivered rows next trigger)
    val fresh = new JsonlMicroBatchStream(out, schema, schema, Array.empty, 1L << 20)
    val o3 = fresh.latestOffset(o2, null)
    assert(files(o3) === files(o2),
      s"restarted stream regressed the offset: ${files(o3)} vs ${files(o2)}")
    // wall-clock gate: even with the poll count satisfied, a stream
    // configured with a long stability window keeps clamping
    val slow = new JsonlMicroBatchStream(out, schema, schema, Array.empty, 1L << 20,
      stablePolls = 3, stableMs = 3600000L)
    var os: org.apache.spark.sql.connector.read.streaming.Offset =
      JsonlStreamOffset(Map.empty)
    (1 to 5).foreach(_ => os = slow.latestOffset(os, null))
    assert(files(os).values.sum === 0L,
      "unterminated file admitted before the wall-clock stability window")
  }

  test("a file appended to AFTER its job commit is never zone-pruned (stats predate its tail)") {
    import graft.sources.{JsonlMicroBatchStream, JsonlStreamOffset}
    import org.apache.spark.sql.sources.GreaterThan
    import spark.implicits._
    val out = Files.createTempDirectory("dsv2zappend").toString + "/z"
    // one committed file, doc_id in [0, 10): a > 100 filter provably
    // excludes it per the committed stats
    (0L until 10L).toDF("doc_id").coalesce(1)
      .write.format("graft-jsonl").mode("overwrite").save(out)
    val schema = StructType(Seq(StructField("doc_id", LongType)))
    val dataFile = new java.io.File(out).listFiles()
      .filter(f => f.getName.endsWith(".jsonl")).head
    def batchRows() = spark.read.format("graft-jsonl").schema(schema)
      .load(out).where(col("doc_id") > 100L)
      .select("doc_id").as[Long].collect().sorted.toSeq
    def streamSplits() = {
      val ms = new JsonlMicroBatchStream(
        out, schema, schema, Array(GreaterThan("doc_id", 100L)),
        splitBytes = 1L << 20)
      ms.planInputPartitions(JsonlStreamOffset(Map.empty), ms.latestOffset()).length
    }
    // before the append: both paths prune the file whole
    assert(batchRows() === Seq.empty)
    assert(streamSplits() === 0, "committed file should be zone-pruned")
    // EXTERNAL append (no job commit, manifest untouched): rows the
    // committed stats never saw, some of which MATCH the filter
    val w = new java.io.FileWriter(dataFile, true)
    try w.write("{\"doc_id\":500}\n{\"doc_id\":7}\n") finally w.close()
    // the recorded commit length no longer matches the snapshot — the
    // stats must be distrusted: batch sees the appended match, a fresh
    // stream plans the file instead of silently advancing past it
    assert(batchRows() === Seq(500L),
      "appended row lost: batch pruned on stale zone stats")
    assert(streamSplits() > 0,
      "appended row lost: stream pruned on stale zone stats")
  }

  test("limit pushdown stops the reader early and surfaces in the scan") {
    val df = v2().limit(7)
    val plan = planOf(df)
    assert(plan.contains("PushedLimit: 7"), plan)
    assert(df.count() === 7)
  }

  test("streaming read: AvailableNow processes the directory; a second run reads only the delta") {
    import java.nio.file.{Paths, StandardOpenOption}
    import org.apache.spark.sql.streaming.Trigger
    val base = Files.createTempDirectory("dsv2stream").toString
    val dir = s"$base/in"
    new java.io.File(dir).mkdirs()
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType)))
    def writeFile(name: String, ids: Range): Unit =
      Files.write(Paths.get(s"$dir/$name"),
        (ids.map(i => s"""{"id":$i,"v":"x$i"}""").mkString("\n") + "\n")
          .getBytes("UTF-8"),
        StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    writeFile("a.jsonl", 0 until 100)
    writeFile("b.jsonl", 100 until 250)

    def runOnce(): Unit = {
      val q = spark.readStream.format("graft-jsonl").schema(schema)
        .load(dir)
        .writeStream.format("parquet")
        .option("path", s"$base/out")
        .option("checkpointLocation", s"$base/chk")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
      assert(!q.isActive)
    }
    runOnce()
    val first = spark.read.schema(schema).parquet(s"$base/out")
      .select("id").as[Long].collect().sorted.toSeq
    assert(first === (0L until 250L))

    // delta: one new file plus line-aligned growth of an existing one
    writeFile("c.jsonl", 250 until 300)
    writeFile("a.jsonl", 300 until 320)
    runOnce()
    val second = spark.read.schema(schema).parquet(s"$base/out")
      .select("id").as[Long].collect().sorted.toSeq
    assert(second === (0L until 320L),
      "second run must read exactly the new file and the appended lines, once")
  }

  test("scan reports file-size statistics, and a small side broadcasts against it") {
    val stats = v2().queryExecution.optimizedPlan.stats
    val onDisk = new java.io.File(jsonlDir).listFiles()
      .filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .map(_.length()).sum
    assert(stats.sizeInBytes === BigInt(onDisk), s"${stats.sizeInBytes} vs $onDisk")
    // with a real size on the big side, joining a tiny frame broadcasts
    val tiny = Seq(("en", 1), ("de", 2)).toDF("lang", "w")
    val joined = v2().join(tiny, Seq("lang"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("malformed lines: PERMISSIVE default yields null rows, FAILFAST names the file") {
    import java.nio.file.Paths
    val dir = Files.createTempDirectory("dsv2bad").toString + "/in"
    new java.io.File(dir).mkdirs()
    Files.write(Paths.get(s"$dir/a.jsonl"),
      """{"id":1,"v":"ok"}
        |{not json at all
        |{"id":3,"v":"ok3"}
        |""".stripMargin.getBytes("UTF-8"))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType)))
    val permissive = spark.read.format("graft-jsonl").schema(schema).load(dir)
    assert(permissive.count() === 3)
    assert(permissive.where(col("id").isNull && col("v").isNull).count() === 1)
    // matches the built-in reader's PERMISSIVE row count
    assert(spark.read.schema(schema).json(dir).count() === 3)
    // a pushed filter silently drops the null row, like parquet would
    assert(permissive.where(col("id") >= 1).count() === 2)
    val strict = spark.read.format("graft-jsonl").schema(schema)
      .option("mode", "FAILFAST").load(dir)
    val ex = intercept[Exception](strict.count())
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(m => m.contains("FAILFAST") && m.contains("a.jsonl")),
      messages(ex).mkString(" | "))
  }

  test("runtime filters apply row-level in the reader") {
    import org.apache.spark.sql.sources.{Filter, In}
    import graft.sources.{JsonlScanBuilder, JsonlScan}
    // drive the connector API directly: a runtime In-filter arriving
    // after planning must restrict what the reader emits
    val scan = new JsonlScanBuilder(jsonlDir, docsSchema, 128L * 1024 * 1024)
      .build().asInstanceOf[JsonlScan]
    assert(scan.filterAttributes().map(_.describe()).contains("lang"))
    scan.filter(Array[Filter](In("lang", Array("en"))))
    val factory = scan.createReaderFactory()
    val parts = scan.toBatch.planInputPartitions()
    var total = 0L
    parts.foreach { p =>
      val r = factory.createReader(p)
      try while (r.next()) total += 1
      finally r.close()
    }
    val expected = spark.read.schema(docsSchema).json(jsonlDir)
      .where(col("lang") === "en").count()
    assert(total === expected)
    assert(total > 0)
  }

  test("split size never changes what is read (boundary-ownership invariance)") {
    val out = Files.createTempDirectory("dsv2inv").toString + "/one.jsonl"
    // variable-length lines so byte boundaries fall mid-line in
    // different places for every split size
    val lines = (0 until 1200).map(i => s"""{"id":$i,"v":"${"y" * (i % 37)}"}""")
    Files.write(java.nio.file.Paths.get(out),
      lines.mkString("\n").getBytes("UTF-8"))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType)))
    for (split <- Seq("64", "257", "1024", "5000", "999999")) {
      val ids = spark.read.format("graft-jsonl").schema(schema)
        .option("splitSizeBytes", split)
        .load(out)
        .select("id").as[Long].collect().sorted.toSeq
      assert(ids === (0L until 1200L), s"splitSizeBytes=$split")
    }
  }

  test("aggregate pushdown: COUNT/MIN/MAX reach the scan; unsupported shapes fall back") {
    val agg = v2().agg(
      count(lit(1)).as("n"),
      min(col("n_chars")).as("mn"),
      max(col("n_chars")).as("mx"),
      count(col("lang")).as("nl"))
    val plan = planOf(agg)
    assert(plan.contains("PushedAggregation: [COUNT(*), MIN(n_chars), MAX(n_chars), COUNT(lang)]"), plan)
    val builtin = spark.read.schema(docsSchema).json(jsonlDir).agg(
      count(lit(1)), min(col("n_chars")), max(col("n_chars")), count(col("lang")))
      .head()
    assert(agg.head() === builtin)

    // with a pushed filter the partials must reflect it
    val filtered = v2().where(col("lang") === "en").agg(count(lit(1)).as("n"))
    assert(planOf(filtered).contains("PushedAggregation: [COUNT(*)]"), planOf(filtered))
    assert(filtered.head().getLong(0) ===
      spark.read.schema(docsSchema).json(jsonlDir)
        .where(col("lang") === "en").count())

    // avg is not pushable; result still correct
    val fallback = v2().agg(avg(col("n_chars")).as("a"))
    assert(!planOf(fallback).contains("PushedAggregation"), planOf(fallback))
    assert(fallback.head().getDouble(0) ===
      spark.read.schema(docsSchema).json(jsonlDir).agg(avg(col("n_chars"))).head().getDouble(0))

    // grouped aggregation is not pushed (no grouping support); correct anyway
    val grouped = v2().groupBy("lang").agg(count(lit(1)).as("n"))
    assert(!planOf(grouped).contains("PushedAggregation"), planOf(grouped))
    assert(grouped.orderBy("lang").collect().toSeq ===
      spark.read.schema(docsSchema).json(jsonlDir)
        .groupBy("lang").agg(count(lit(1)).as("n")).orderBy("lang").collect().toSeq)
  }

  test("bounded schema inference reads one line, types integrals as long") {
    val inferred = spark.read.format("graft-jsonl").load(jsonlDir)
    val m = inferred.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(m("doc_id") === LongType)
    assert(m("text") === StringType)
    assert(m("n_chars") === LongType)
  }
}
