package graft.tools

import java.nio.file.{Files, Paths}

/** Regenerates PLANS.md: formatted physical plans of the flagship query
  * shapes with the scale property each demonstrates. Run:
  * `sbt "runMain graft.tools.PlanDump"` after plan-affecting changes.
  */
object PlanDump {

  private val shown: Seq[(String, String)] = Seq(
    "q_knn_euclidean" ->
      "Exact kNN: pruned (vec_id, embedding) scan → fused codegen distance → shuffle-free TakeOrderedAndProject (per-partition k-heaps, k rows to the driver).",
    "q_filter_revenue" ->
      "Filter + aggregate: predicates pushed into the parquet scan, 3-column pruned read, partial aggregation before the single shuffle.",
    "q_segment_revenue" ->
      "Fact-to-dim join: broadcast hash join (no shuffle of the fact table) feeding a partially-aggregated groupBy.",
    "q_lsh_knn" ->
      "LSH probe: fused signature expressions filter candidates during the scan; exact re-rank is the same shuffle-free top-k.",
    "q_neardup_pairs" ->
      "MinHash near-dup: band-key self-join shuffles only (id, band, key) rows; exact Jaccard verify joins run on candidates only; no cartesian anywhere.",
    "q_fingerprint" ->
      "Winnowing fingerprints: fused GramHashes/Winnow codegen kernels — one pass per row inside WholeStageCodegen, no shuffle at all.",
    "q_version_diff" ->
      "CDC changelog between two library versions: both version reads co-partition on id into one full-outer SortMergeJoin (equi-join, never a nested loop), classification and the tiny groupBy ride on top - the diff of a 100 TB table shuffles each side once on the join key.",
    "q_quality_constraints" ->
      "Data-quality constraint suite: each expectation is a one-row aggregate; referential integrity is a key equi anti-join (AQE broadcast at this SF, shuffle anti-join at scale). The union of verdict rows costs one pass per table.",
    "q_curation_pipeline" ->
      "Curation capstone (normalize -> quality gate -> exact dedup -> split -> stats) in ONE plan: the fused TokenStats kernel gates rows during the scan, only 4 narrow columns cross the single dedup exchange, and WindowGroupLimit keeps one survivor per canonical hash on BOTH sides of it (partial before, final after) - the shuffle moves at most one row per (partition, hash).",
    "q_pack_sequences" ->
      "Sequence packing: ONE hash exchange on shard feeds the running-sum window AND the co-partitioned (shard, seq) manifest aggregation (subset rule) — a second shuffle never appears at any scale.",
    "q_asof_join" ->
      "Backward as-of join: both sides union into one stream, ONE hash exchange on the key feeds the per-partition time sort + running-last window — no join operator, no (left × earlier-right) pair blowup.",
    "q_ivf_knn" ->
      "IVF re-rank over the probed candidate set (materialized, hence the LogicalRDD scan): shuffle-free exact top-k. The probe itself — assignments scan with PartitionFilters on cell, nProbe partition dirs read — executes eagerly before this plan; IndexPersistenceSpec pins its pruned shape.",
    "q_range_join" ->
      "Point-in-interval range join: intervals explode onto fixed-width buckets, the join is a hash EQUI-join on the bucket id with the exact BETWEEN as post-filter — never the BroadcastNestedLoopJoin a raw range predicate plans.",
    "q_bm25" ->
      "BM25 ranking: corpus stats (N, avgdl, df) are inlined literals after one bounded aggregate, so scoring is a pure scan-side projection feeding a shuffle-free TakeOrderedAndProject — no inverted index, no explode, no join.",
    "q_rolling_features" ->
      "Rolling past-only feature windows: both RANGE frames (1 h, 24 h) share the single user_id hash exchange — adding a third width would still not add a shuffle.",
    "q_neardup_incremental" ->
      "Incremental near-dup: the incoming batch's band rows hash-join the existing corpus's (capped) band rows — per-ingest cost is O(batch + matched buckets), never a corpus self-join.",
    "q_grouped_topk" ->
      "Grouped top-k through the custom operator (LogicalPlan → SparkStrategy → partial/final exec): per-partition bounded k-heaps per key, ONE exchange of the ≤ partitions×keys×k survivors, no Sort and no Window anywhere — the grouped TakeOrderedAndProject.",
    "q_bucketed_join" ->
      "Bucketed co-located join: both sides pre-bucketed on the join key at write time; the SMJ reads 'Bucketed: true' scans and the only exchange in the plan is the final small groupBy.",
    "q_kmv_distinct" ->
      "KMV distinct sketch: the custom KmvSketchAgg TypedImperativeAggregate plans as ObjectHashAggregate partial/final — each partition's bounded distinct k-min tree crosses the exchange as at most k longs (a distinct().orderBy.limit formulation would shuffle every distinct hash); the hash is the fused Md5Prefix48 codegen expression inside the scan projection.",
    "q_ann_probe_rule" ->
      "Catalyst ANN rewrite (probe branch): AnnProbeRule substituted the PERSISTED artifact's probe plan — candidate ids from L partition-pruned one-table scans of the signature table (sig equality pushed to parquet) feed an existence hash join against the ONE corpus scan, and the scalar-subquery under-k guard counts the ARTIFACT's candidates, never a second corpus pass. The under-k branch degenerates the predicate to the exact plan.",
    "q_phrase_search" ->
      "Phrase search over the persisted positional inverted index: the postings scan carries PartitionFilters on the query terms' bucket ids (only those directories are read) plus pushed term filters; the phrase itself is a hash EQUI-join of the per-term postings on (doc_id, pos - i) — corpus text never appears in the plan.",
    "q_kmeans" ->
      "k-means readout: the Lloyd rounds already ran as literal-centroid aggregations; the final assignment is a pure scan-side projection (centroids inlined in the distance expressions, no join, no shuffle) feeding ONE map-combined groupBy — K×(dim+1) partial sums per partition is all that ever crosses an exchange.",
    "q_regional_revenue" ->
      "TPC-H Q5 star join: lineitem⋈orders⋈customer co-shuffle (or AQE-broadcast) on their own keys while supplier/nation/pre-filtered region enter as BroadcastExchanges — at any scale the dimensions never shuffle and the fact table shuffles only on join keys.",
    "q_ivfpq_knn" ->
      "IVF-PQ: the probed read of the cell-partitioned CODES table (4 bytes/vector, PartitionFilters on cell) executes eagerly before this plan; what remains is pure per-row ADC — 4 literal-table lookups + a fixed-order sum inside codegen — feeding the shuffle-free top-k. The float vectors never appear at query time.",
    "q_ngram_jaccard" ->
      "EXACT Jaccard self-join with prefix filtering (AllPairs/PPJoin): the fused shingle kernel feeds 64-bit hashed sets; candidates come from an equi-join of rarest-first PREFIXES only (plus the integer length filter), emitted exactly once per pair at the first shared prefix shingle — no DISTINCT stage — and the SHUFFLE_HASH verify attaches stream the pair rows unsorted. Completeness for J >= t is a pigeonhole theorem, not a probabilistic bet; the oracle re-derives the same pairs through an inverted shingle index, prefix-filter-free.",
    "q_countmin_heavy" ->
      "Count-min heavy hitters: the fused AllShingles kernel explodes zero-copy slices, ONE groupBy exchange produces the per-shingle counts, and BOTH consumers (the 768-cell sketch aggregation and the exact top-20 TakeOrdered) reuse that exchange — the sketch's md5 cell hashes run per DISTINCT shingle, and only 768 integer cells ever describe the corpus.",
    "q_bloom_decontam" ->
      "Bloom-prefiltered decontamination: the 16384-bit eval bitmap rides the plan as ONE literal array; corpus fingerprints failing any of the 3 bit-tests (uint32 chunks of a single md5) are nulled BEFORE the broadcast verify join, so null-key short-circuiting means only bloom survivors probe the hash table — the explode stream thins before anything joins or aggregates.",
    "q_zorder_skip" ->
      "Z-order + zone-map skipping: the scan carries PartitionFilters with the z-buckets the 64-row zone consult selected (only those directories are listed), the residual user/ts range predicates push into the z-sorted parquet row groups, and what remains is one partially-aggregated groupBy.",
    "q_dsv2_source" ->
      "DataSourceV2 connector scan: the BatchScan line shows the pruned ReadSchema and the pushed filter set the reader evaluates before rows are built — the V2 analog of the parquet PushedFilters audit; file-size statistics let AQE broadcast the right side of any join against this source.",
    "q_funnel" ->
      "Funnel conversion: events collapse to user-level stage times BEFORE each join, so the three stage joins move user-level rows only; all three stage frames and the final union-groupBy co-partition on user_id.",
    "q_dsv2_agg" ->
      "Connector aggregate pushdown: the BatchScan line carries PushedAggregation — each split returns ONE partial COUNT/MIN/MAX row (the COUNT(*) partial is line counting, no JSON parse) and the HashAggregate above merges partials; the corpus is never materialized as rows.",
    "q_ann_probe_rule_ivf" ->
      "Catalyst ANN rewrite selecting the IVF artifact: the same kNN pattern, but the candidate side is a PartitionFilters-pruned read of the persisted cell-partitioned assignments table (the nProbe query-nearest cells), existence-joined against the one corpus scan with the same artifact-count under-k guard. Which index probes is an explicit registration-token decision — a same-dim foreign corpus can never match an index by accident.",
    "q_dsv2_zones" ->
      "Connector zone maps: the range predicate reaches the reader as pushed filters AND prunes whole files at split-planning time via the job-commit _zones.json manifest (range-clustered write → disjoint per-file doc_id ranges) — at 100 TB a selective range predicate reads the few overlapping files, not the directory.")

  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val sb = new StringBuilder
    sb.append("# PLANS — physical plans of the flagship query shapes\n\n")
    sb.append("Generated by `graft.tools.PlanDump` on sf0.001 (plan shapes are\n")
    sb.append("scale-invariant; per-partition parallelism changes, operators don't).\n")
    sb.append("PlanAuditSpec asserts the properties below in CI.\n")
    shown.foreach { case (name, note) =>
      val df = graft.SparkEntry.queries(name)(spark, dir)
      sb.append(s"\n## $name\n\n$note\n\n```\n")
      sb.append(df.queryExecution.executedPlan.toString.take(4000))
      sb.append("```\n")
    }
    Files.writeString(Paths.get("PLANS.md"), sb.toString)
    println(s"[plandump] wrote PLANS.md (${shown.size} plans)")
    spark.stop()
  }
}
