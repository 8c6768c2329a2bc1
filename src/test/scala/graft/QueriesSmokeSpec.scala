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

  /** Queries whose correct result CAN be empty on this synthetic data
    * (every sf0.001 customer has orders, so the anti join is empty). */
  private val mayBeEmpty = Set("q_anti_customers_without_orders")

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs on sf0.001 and returns rows") {
      val df = fn(spark, sfDir)
      assert(df.columns.nonEmpty)
      if (!mayBeEmpty(name)) assert(df.count() > 0L, s"$name returned no rows")
      else df.count() // still must execute
    }
  }
}
