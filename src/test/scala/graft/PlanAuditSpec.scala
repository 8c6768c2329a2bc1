package graft

/** Physical-plan audit: asserts the scale-critical plan properties —
  * pruned scans, pushed filters, broadcast joins, shuffle-free top-k,
  * no cartesian products — so a regression that silently degrades the
  * 100 TB story fails CI, not a cluster run.
  */
class PlanAuditSpec extends SparkSpec with org.scalatest.BeforeAndAfterAll {

  override def beforeAll(): Unit = {
    super.beforeAll()
    // other suites cache() the same parquet in the shared session; the
    // audit must see the real FileScan plans, not InMemoryTableScan
    spark.sharedState.cacheManager.clearCache()
  }

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString

  test("kNN plans: shuffle-free TakeOrderedAndProject over a pruned scan") {
    Seq("q_knn_euclidean", "q_knn_cosine", "q_knn_dot", "q_knn_manhattan").foreach { q =>
      val plan = planOf(q)
      assert(plan.contains("TakeOrderedAndProject"), s"$q: no TakeOrderedAndProject")
      assert(!plan.contains("Exchange"), s"$q: unexpected shuffle")
      // column pruning: the parquet scan must read only (vec_id, embedding)
      assert(plan.contains("ReadSchema: struct<vec_id:bigint,embedding:array<float>>"),
        s"$q: scan not pruned")
    }
  }

  test("filter query pushes predicates into the pruned parquet scan") {
    val plan = planOf("q_filter_revenue")
    // (the PushedFilters list is elided in toString; assert on the
    // visible prefix + the pruned read schema)
    assert(plan.contains("PushedFilters: [IsNotNull(l_discount), IsNotNull(l_quantity), GreaterThanOrEqual(l_discount,0.04)"),
      "discount predicates not pushed")
    assert(plan.contains("ReadSchema: struct<l_quantity:double,l_extendedprice:double,l_discount:double>"),
      "lineitem scan not pruned to the 3 needed columns")
  }

  test("dimension joins broadcast the small side") {
    Seq("q_segment_revenue", "q_region_customers", "q_knn_doc_join").foreach { q =>
      assert(planOf(q).contains("BroadcastHashJoin"), s"$q: dim join not broadcast")
    }
  }

  test("aggregations are partial (map-side combine before the shuffle)") {
    val plan = planOf("q1_agg")
    // two HashAggregate operators (partial + final) around one exchange
    assert("HashAggregate".r.findAllIn(plan).length >= 2, "no partial aggregation")
  }

  test("top-k over orders avoids a global sort") {
    val plan = planOf("q_topk_orders")
    assert(plan.contains("TakeOrderedAndProject"))
    assert(!plan.contains("Exchange rangepartitioning"), "global sort planned")
  }

  test("sequence packing: one shuffle — the manifest groupBy reuses the shard partitioning") {
    val plan = planOf("q_pack_sequences")
    // the running-sum window shuffles by shard once; the (shard, seq)
    // aggregation is then co-partitioned (subset rule) and must NOT
    // shuffle again, at any scale
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges === 1, s"want 1 exchange, got $exchanges:\n$plan")
    assert("HashAggregate".r.findAllIn(plan).length >= 2, "no partial aggregation")
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      s"documents scan not pruned:\n$plan")
  }

  test("scan-side scoring queries plan zero exchanges") {
    // vocab scoring (after the bounded vocab collect) and PII redaction
    // are pure per-row work: any Exchange here is a regression
    Seq("q_vocab_score", "q_redact_pii").foreach { q =>
      val plan = planOf(q)
      assert(!plan.contains("Exchange"), s"$q: unexpected shuffle:\n$plan")
      assert(plan.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
        s"$q: documents scan not pruned:\n$plan")
    }
  }

  test("round-5 shapes: chunking scan-side, rolling one exchange, bm25 join-free top-k") {
    // document chunking is explode+slice per row — a shuffle would mean
    // the operator stopped being embarrassingly parallel
    assert(!planOf("q_chunk_docs").contains("Exchange"),
      s"q_chunk_docs: unexpected shuffle:\n${planOf("q_chunk_docs")}")
    // both rolling windows share the user_id partitioning: ONE exchange
    val roll = planOf("q_rolling_features")
    assert("Exchange hashpartitioning".r.findAllIn(roll).length === 1,
      s"rolling features must reuse one keyed exchange:\n$roll")
    // bm25: stats are inlined literals, so the ranked output is a
    // TakeOrdered over a pure projection — no join node anywhere
    val bm = planOf("q_bm25")
    assert(bm.contains("TakeOrderedAndProject"), s"q_bm25: no top-k:\n$bm")
    assert(!bm.contains("Join"), s"q_bm25: unexpected join:\n$bm")
    // range join: the bucketed equi-join, never a nested loop (blanket
    // no-BNLJ test covers it too; this pins the positive shape)
    val rj = planOf("q_range_join")
    assert(rj.contains("BroadcastHashJoin") || rj.contains("SortMergeJoin") ||
      rj.contains("ShuffledHashJoin"), s"q_range_join: no equi-join in plan:\n$rj")
  }

  test("bucketed join: both scans bucketed, no exchange before the join") {
    val plan = planOf("q_bucketed_join")
    assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
    assert("Bucketed: true".r.findAllIn(plan).length === 2,
      s"both sides must read bucketed:\n$plan")
    // the ONLY exchange is the final small groupBy — the join itself
    // reuses the write-time bucketing
    assert("Exchange hashpartitioning".r.findAllIn(plan).length === 1,
      s"bucketed join must not shuffle its inputs:\n$plan")
  }

  test("as-of join: event_type pushed to both scans, one keyed exchange, no join") {
    val plan = planOf("q_asof_join")
    // Assert the pushed predicates individually (order/neighbour-insensitive):
    // the right side gained IsNotNull(ts) when AsOfJoin started excluding
    // null-timestamp rows, and a literal multi-filter pin went stale.
    val pushedLines = plan.linesIterator.filter(_.contains("PushedFilters: [")).toSeq
    def pushedWith(pred: String): Boolean =
      pushedLines.exists(l => l.contains(pred) && l.contains("IsNotNull(event_type)"))
    assert(pushedWith("EqualTo(event_type,purchase)"), s"purchase filter not pushed:\n$plan")
    assert(pushedWith("EqualTo(event_type,click)"), s"click filter not pushed:\n$plan")
    assert(pushedLines.exists(l => l.contains("EqualTo(event_type,click)") && l.contains("IsNotNull(ts)")),
      s"click-side null-ts guard not pushed:\n$plan")
    assert(!plan.contains("Join"), s"as-of must not plan a join:\n$plan")
    // exactly two exchanges: the click-dedup aggregation + the window key
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges === 2, s"want 2 exchanges, got $exchanges:\n$plan")
  }

  test("decontamination broadcasts the eval fingerprint side") {
    val plan = planOf("q_decontaminate")
    assert(plan.contains("BroadcastHashJoin"),
      s"eval fp set must broadcast:\n$plan")
    assert(plan.contains("LeftOuter"), s"overlap join must be left-outer:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"corpus side must never sort-merge against the eval set:\n$plan")
  }

  test("order-only queries carry no global sort inside the query plan") {
    SparkEntry.verifyOrder.keys
      .filterNot(_ == "q_neardup_pairs") // pair output, sorted only in Verify dump
      .foreach { q =>
        assert(!planOf(q).contains("Exchange rangepartitioning"),
          s"$q: range-shuffle sort crept back into the query")
      }
  }

  test("no cartesian products or nested-loop joins in any query plan") {
    // crud/hnsw execute driver-side work on build; they are audited by
    // their own suites — this sweep covers the declarative queries
    val skip = Set("q_crud_pipeline", "q_hnsw_knn")
    SparkEntry.queries.keys.filterNot(skip).foreach { q =>
      val plan = planOf(q)
      assert(!plan.contains("CartesianProduct"), s"$q: cartesian product")
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"$q: nested-loop join")
    }
  }

  test("embedding scan for q_embed_knn prunes to the needed columns") {
    val plan = planOf("q_embed_knn")
    // documents scan must not read source/n_chars (only doc_id, text, lang)
    assert(!plan.contains("n_chars:bigint"), "documents scan reads unused columns")
  }

  test("q_ann_probe_rule: the rewrite probes the PERSISTED sig table — no corpus-sized scan in the probe") {
    val plan = planOf("q_ann_probe_rule")
    // the probe is an existence join against candidate ids read from the
    // persisted artifact (partition-pruned per table), not a per-row
    // signature recomputation over the corpus
    assert(plan.contains("ExistenceJoin"), "artifact probe join missing")
    assert(plan.contains("lsh_idx"), "probe does not read the persisted sig table")
    assert(plan.contains("PartitionFilters: [isnotnull(table_idx"),
      "sig table read is not partition-pruned")
    assert(!plan.contains("lsh_signature"),
      "probe recomputes signatures over the corpus instead of reading the artifact")
    // the under-k guard plans as an uncorrelated scalar subquery
    assert(plan.contains("Subquery") || plan.contains("subquery"),
      "under-k scalar-subquery guard missing")
    // corpus scanned exactly once per branch (probe side of the join):
    // the guard + candidates come from the artifact
    assert("embeddings\\.parquet".r.findAllIn(plan).length === 2,
      "corpus scanned more than once per branch")
    // the conf is scoped inside the query body: a kNN built AFTERWARDS
    // must NOT be rewritten (other queries' exactness is untouched)
    val after = graft.operators.FlatKnn
      .search(spark.read.parquet(s"$sfDir/embeddings.parquet"),
        Seq.fill(16)(0.1f), 5)
      .queryExecution.optimizedPlan.toString
    assert(!after.contains("ExistenceJoin"), "probe conf leaked out of the query body")
  }

  test("q_ann_probe_rule_ivf: the rewrite probes the persisted cell-partitioned assignments") {
    val plan = planOf("q_ann_probe_rule_ivf")
    assert(plan.contains("ExistenceJoin"), "artifact probe join missing")
    assert(plan.contains("ivf_idx"), "probe does not read the persisted assignments")
    assert(plan.contains("PartitionFilters: [cell"),
      "assignments read is not partition-pruned to the probed cells")
    assert(!plan.contains("lsh_idx"), "wrong artifact selected")
    assert(plan.contains("Subquery") || plan.contains("subquery"),
      "under-k scalar-subquery guard missing")
    assert("embeddings\\.parquet".r.findAllIn(plan).length === 2,
      "corpus scanned more than once per branch")
  }
}
