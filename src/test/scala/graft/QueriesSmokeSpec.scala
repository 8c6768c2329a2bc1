package graft

/** Integration smoke over the whole driver contract: every
  * SparkEntry.queries entry must run on sf0.001 and produce rows, every
  * oracleSql key must reference an existing query, and the flagship
  * entry must be non-empty. Catches a broken query before the driver's
  * round-level CORRECTNESS run does.
  */
class QueriesSmokeSpec extends SparkSpec {

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0L)
  }

  test("every oracleSql key has a matching queries entry") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracleSql without queries: $orphans")
  }

  test("every verifyOrder entry names a real query and existing output columns") {
    SparkEntry.verifyOrder.foreach { case (name, cols) =>
      assert(SparkEntry.queries.contains(name), s"verifyOrder orphan: $name")
      val out = SparkEntry.queries(name)(spark, sfDir).columns.toSet
      val missing = cols.filterNot(out)
      assert(missing.isEmpty, s"$name: verifyOrder columns $missing not in $out")
    }
  }

  test("queries with an oracle and no in-query ordering are listed in verifyOrder") {
    // a query whose oracle has ORDER BY but whose plan neither sorts nor
    // appears in verifyOrder would hash-nondeterministically at the driver
    SparkEntry.oracleSql.keys.foreach { name =>
      val plan = SparkEntry.queries(name)(spark, sfDir).queryExecution.analyzed.toString
      val sortedInQuery = plan.contains("Sort [")
      val single = SparkEntry.queries(name)(spark, sfDir).schema.length <= 2 &&
        name == "q_filter_revenue" // single-row aggregate needs no order
      assert(
        sortedInQuery || SparkEntry.verifyOrder.contains(name) ||
          name == "q_dedup_exact_stats" || single,
        s"$name: no in-query sort and no verifyOrder entry")
    }
  }

  /** Queries whose correct result CAN be empty on this synthetic data
    * (every sf0.001 customer has orders, so the anti join is empty). */
  private val mayBeEmpty = Set("q_anti_customers_without_orders")

  test("q_cdc_chunks survives documents shorter than the gram width") {
    // a < 8-char text makes GramHashes return an EMPTY array; the cuts
    // derivation must take the guarded empty branch instead of letting
    // sequence(1, 0) produce a descending [1, 0] and element_at(g, 0)
    // throw at runtime
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cdcshort").toString
    Seq(
      (1L, "ab", "en", "s", 2L),
      (2L, "", "en", "s", 0L),
      (3L, "a document comfortably longer than the rolling-hash gram width", "en", "s", 62L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("q_cdc_chunks")(spark, dir).collect()
    assert(out.length === 3)
    val byId = out.map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(byId(1L) === 1) // whole short text = one chunk
    assert(byId(2L) === 0) // empty text = zero chunks
    assert(byId(3L) >= 1)
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs on sf0.001 and returns rows") {
      val df = fn(spark, sfDir)
      assert(df.columns.nonEmpty)
      if (!mayBeEmpty(name)) assert(df.count() > 0L, s"$name returned no rows")
      else df.count() // still must execute
    }
  }
}
