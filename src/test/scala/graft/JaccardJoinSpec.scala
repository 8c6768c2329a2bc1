package graft

import org.apache.spark.sql.functions._
import graft.operators.JaccardJoin

/** Exact n-gram Jaccard self-join with prefix filtering: equivalence
  * with the naive all-pairs definition (completeness — the prefix filter
  * must drop NOTHING above threshold), threshold-boundary exactness, and
  * the no-cartesian plan shape. */
class JaccardJoinSpec extends SparkSpec {

  private def docs = spark.read
    .parquet(s"$sfDir/documents.parquet")
    .select("doc_id", "text")

  private def key(r: org.apache.spark.sql.Row) =
    (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3))

  test("prefix-filtered join == naive all-pairs on real documents") {
    val fast = JaccardJoin.selfJoin(docs, "doc_id", "text")
      .collect().map(key).sortBy(_.toString())
    val naive = JaccardJoin.naiveSelfJoin(docs, "doc_id", "text")
      .collect().map(key).sortBy(_.toString())
    assert(fast.nonEmpty, "fixture must produce at least one pair")
    assert(fast.sameElements(naive))
  }

  test("rational threshold is an exact boundary (integer cross-multiply)") {
    import spark.implicits._
    // J exactly 3/5: |A|=|B|=4 shingles, 3 common, union 5.
    // 6-token docs -> 4 trigram shingles each; first 3 shingles shared.
    val a = "w1 w2 w3 w4 w5 xa"
    val b = "w1 w2 w3 w4 w5 xb"
    val df = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val at = JaccardJoin.selfJoin(df, "doc_id", "text", k = 3, tNum = 3, tDen = 5)
      .collect()
    assert(at.length === 1 && at.head.getInt(2) === 3 && at.head.getInt(3) === 5)
    // one notch above 3/5 excludes the same pair — no float fuzz
    val above = JaccardJoin.selfJoin(df, "doc_id", "text", k = 3, tNum = 61, tDen = 100)
      .collect()
    assert(above.isEmpty)
  }

  test("randomized corpora: fast == naive across thresholds and edge shapes") {
    import spark.implicits._
    // seeded RNG: duplicates, short docs (< k tokens -> whole-text
    // shingle), empty docs, and a tiny vocabulary that forces heavy
    // shingle sharing — the regimes where a wrong prefix length or a
    // broken boundary comparison would diverge from the definition
    val rnd = new scala.util.Random(42)
    val vocab = Vector("a", "bb", "ccc", "dd", "e")
    (1 to 4).foreach { trial =>
      val docs = (0 until 40).map { i =>
        val n = rnd.nextInt(12) // 0..11 tokens
        val text = Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
        (i.toLong, if (i % 13 == 0) "" else text)
      } ++ Seq((100L, "dup dup dup dup"), (101L, "dup dup dup dup"))
      val df = docs.toDF("doc_id", "text")
      for ((tn, td) <- Seq((1, 2), (3, 5), (4, 5), (1, 1))) {
        val fast = JaccardJoin.selfJoin(df, "doc_id", "text", 3, tn, td)
          .collect().map(key).sortBy(_.toString()).toSeq
        val naive = JaccardJoin.naiveSelfJoin(df, "doc_id", "text", 3, tn, td)
          .collect().map(key).sortBy(_.toString()).toSeq
        assert(fast == naive, s"trial $trial t=$tn/$td")
      }
    }
  }

  test("plan has no cartesian stage and candidates come from an equi-join") {
    val plan = JaccardJoin.selfJoin(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("shingle kernel evaluates ONCE per row per branch (no inferred-filter duplication)") {
    // round-6 watch item: a plain explode let the optimizer infer
    // size(s)>0 AND isnotnull(s) below the Generate, re-materializing
    // the kernel into each pushed conjunct — 3 evaluations per row per
    // scan branch. The explode_outer restructure must keep the kernel a
    // single projection: every optimized-plan line mentioning the kernel
    // is a Project, never a Filter, and carries exactly one invocation.
    val plan = JaccardJoin.selfJoin(docs, "doc_id", "text")
      .queryExecution.optimizedPlan.toString
    val kernelLines = plan.linesIterator.filter(_.contains("distinct_shingles")).toSeq
    assert(kernelLines.nonEmpty)
    kernelLines.foreach { line =>
      assert(!line.trim.stripPrefix(":").trim.stripPrefix("+- ").startsWith("Filter"),
        s"kernel re-materialized into a pushed filter:\n$line")
      assert("distinct_shingles".r.findAllIn(line).length === 1,
        s"kernel evaluated more than once on one plan node:\n$line")
    }
  }

  test("verifyWithStrings: identical pair set and counts on the real corpus") {
    val hashed = JaccardJoin.selfJoin(docs, "doc_id", "text", 3, 4, 5)
      .collect().map(key).sortBy(_.toString()).toSeq
    val strings = JaccardJoin
      .selfJoin(docs, "doc_id", "text", 3, 4, 5, verifyWithStrings = true)
      .collect().map(key).sortBy(_.toString()).toSeq
    assert(hashed == strings)
  }

  test("skew: a shingle shared by 30% of docs stays OUT of rarest-first prefixes") {
    import spark.implicits._
    // 200 docs; 30% share one hot 3-gram ("the quick fox"), each doc
    // also carries unique shingles. Rarest-first ordering must rank the
    // hot shingle LAST within every doc, so it never enters a prefix
    // (every doc here has >= 1 suffix slot at t=1/2) and the candidate
    // join's per-key fan-out stays bounded by rare-shingle frequencies —
    // the hot key contributes ZERO join rows instead of C(60,2).
    val docs = (0 until 200).map { i =>
      val unique = s"u$i v$i w$i x$i y$i z$i"
      val text = if (i % 10 < 3) s"the quick fox $unique" else unique
      (i.toLong, text)
    }.toDF("doc_id", "text")
    val fast = JaccardJoin.selfJoin(docs, "doc_id", "text", 3, 1, 2)
    val naive = JaccardJoin.naiveSelfJoin(docs, "doc_id", "text", 3, 1, 2)
    assert(fast.collect().map(key).sortBy(_.toString()).toSeq ==
      naive.collect().map(key).sortBy(_.toString()).toSeq)
    // structural bound: reconstruct the prefix table the operator builds
    // and assert the hot shingle's hash is in NO doc's prefix
    val hot = spark.range(1).select(
      xxhash64(lit("the quick fox")).cast("long")).head().getLong(0)
    val prefixes = JaccardJoin.prefixTable(docs, "doc_id", "text", 3, 1, 2)
    assert(prefixes.where(col("g") === hot).count() === 0L,
      "hot shingle leaked into a rarest-first prefix — per-key fan-out unbounded")
  }

  test("long-document payload bound: an unsegmented 100k-shingle doc fails LOUDLY at the default cap") {
    import spark.implicits._
    // one pathological crawl-sized document (100k distinct shingles →
    // ~40k prefix rows at t=3/5, an O(prefix²) ≈ 6.4 GB pe payload)
    // among normal docs: the enforced DefaultMaxPrefixLen must kill the
    // query with a named error BEFORE the payload reaches the candidate
    // exchange — a comment-only bound let one such doc take the stage
    // down at 100 TB
    val long = (0 until 100002).map(i => s"tok$i").mkString(" ")
    val docs = (Seq((0L, long)) ++
      (1 to 5).map(i => (i.toLong, s"a b c d$i e f"))).toDF("doc_id", "text")
    val ex = intercept[Exception] {
      JaccardJoin.selfJoin(docs, "doc_id", "text").count()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++
          Option(e.getCause).toSeq.flatMap(messages) ++
          e.getSuppressed.flatMap(messages))
    assert(messages(ex).exists(_.contains("maxPrefixLen")),
      s"expected the named payload-bound failure, got: ${ex.getMessage}")
  }

  test("long-document payload bound: docs AT the cap pass, a raised cap admits longer docs") {
    import spark.implicits._
    // 100 shingles at t=3/5 → prefix 41; cap EXACTLY 41 passes (the
    // rn <= maxPrefixLen boundary itself), cap 40 fails,
    // and an explicit higher cap re-admits the same corpus — the bound
    // binds on the PREFIX length (the payload driver), not doc length
    val text = (0 until 102).map(i => s"w$i").mkString(" ")
    val docs = Seq((0L, text), (1L, text + " tail")).toDF("doc_id", "text")
    val atCap = JaccardJoin
      .selfJoin(docs, "doc_id", "text", maxPrefixLen = 41)
    assert(atCap.count() === 1L, "at-cap corpus must still join")
    val ex = intercept[Exception] {
      JaccardJoin.selfJoin(docs, "doc_id", "text", maxPrefixLen = 40).count()
    }
    assert(Option(ex.getMessage).exists(_.contains("maxPrefixLen")) ||
      Option(ex.getCause).flatMap(c => Option(c.getMessage))
        .exists(_.contains("maxPrefixLen")),
      s"below-cap guard did not fire: ${ex.getMessage}")
    assert(JaccardJoin
      .selfJoin(docs, "doc_id", "text", maxPrefixLen = 10000)
      .count() === 1L)
  }

  test("aggregation-built prefix table == the replaced window formulation, row for row") {
    // round-16 optimization pin: prefixesOf builds (doc_id, n, g, rn, pe)
    // from ONE doc-keyed aggregation (sort_array realizes the global
    // (frequency, shingle) order; posexplode re-derives rank and the
    // strictly-earlier pe slice). This test reconstructs the REPLACED
    // shape — row_number over a doc-partitioned window ordered by
    // (f, g), prefix filter, collect-and-join-back — and asserts exact
    // row-set equality on the real corpus, pe contents included.
    import org.apache.spark.sql.expressions.Window
    val (tNum, tDen) = (4, 5)
    val sets = JaccardJoin.shingleSets(docs, "doc_id", "text", 3)._2
    val exploded = sets
      .select(col("doc_id"), size(col("s")).as("n"), explode_outer(col("s")).as("g"))
      .where(col("g").isNotNull)
    val freq = exploded.groupBy("g").agg(count(lit(1)).as("f"))
    val prefixLen =
      col("n") - expr(s"(n * $tNum + ${tDen - 1}) DIV $tDen") + lit(1)
    val ranked = exploded
      .join(freq, "g")
      .withColumn("rn",
        row_number().over(
          Window.partitionBy("doc_id").orderBy(col("f"), col("g"))))
      .where(col("rn") <= prefixLen)
    val prefixArrays = ranked.groupBy("doc_id")
      .agg(transform(
        sort_array(collect_list(struct(col("f"), col("g")))),
        s => s.getField("g")).as("p"))
    val windowForm = ranked.join(prefixArrays, "doc_id")
      .select(col("doc_id"), col("n"), col("g"), col("rn"),
        slice(col("p"), lit(1), col("rn") - 1).as("pe"))
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"), col("n"), col("g"), col("rn"),
        to_json(struct(col("pe"))).as("pe_json"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3), r.getString(4)))
      .sortBy(_.toString())
    val agg = rows(JaccardJoin.prefixTable(docs, "doc_id", "text", 3, tNum, tDen))
    val win = rows(windowForm)
    assert(agg.nonEmpty, "fixture must produce prefix rows")
    assert(agg.sameElements(win),
      "aggregation-built prefix table diverged from the window formulation")
  }
}
