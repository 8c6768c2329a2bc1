package graft

import graft.tools.ClusterGate
import org.apache.spark.sql.DataFrame

/** The ClusterGate five-invariant proof, in CI (verdict-12 #7): the
  * synthetic-scale gate (tools/ClusterGate via scale_gate.sh) was the
  * only place the invariants ran — a label-propagation regression
  * would surface at gate time, not commit time. This spec runs the
  * SAME [[ClusterGate.invariants]] code twice over:
  *
  *   - positively, on the real q_dedup_clusters output at sf0.001
  *     (clusters must BE the exact min-labeled connected components of
  *     the persisted edge artifact);
  *   - negatively, on seeded tampered clusterings of a tiny graph —
  *     each of the five invariant families must actually fire on the
  *     violation it exists to catch (a gate that cannot reject is not
  *     a gate).
  */
class ClusterGateSpec extends SparkSpec {
  import spark.implicits._

  private val tinyEdges: DataFrame =
    Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")

  private def clusters(rows: (Long, Long, String)*): DataFrame =
    rows.toDF("cluster_rep", "n_docs", "members")

  private def failed(cl: DataFrame, e: DataFrame): Map[String, Long] =
    ClusterGate.invariants(cl, e)._4
      .collect { case (n, v, want) if v != want => n -> v }.toMap

  test("q_dedup_clusters at sf0.001 satisfies all invariants (exact components)") {
    val cl = SparkEntry.queries("q_dedup_clusters")(spark, sfDir).localCheckpoint(true)
    val e = spark.read.parquet(SparkEntry.nearDupEdgesPath(spark, sfDir))
    val (nClusters, nLabeled, nEndpoints, checks) = ClusterGate.invariants(cl, e)
    assert(nClusters > 0 && nLabeled === nEndpoints)
    val bad = checks.filter { case (_, v, want) => v != want }
    assert(bad.isEmpty, s"invariant violations: $bad")
  }

  test("the correct clustering of the tiny graph passes") {
    assert(failed(
      clusters((1L, 3L, "1,2,3"), (10L, 2L, "10,11")), tinyEdges).isEmpty)
  }

  test("OVER-merging (two components under one label) trips connectivity") {
    val bad = failed(clusters((1L, 5L, "1,2,3,10,11")), tinyEdges)
    assert(bad.contains("disconnected_clusters"), s"got: $bad")
  }

  test("UNDER-merging (a split component) trips edge agreement") {
    val bad = failed(
      clusters((1L, 2L, "1,2"), (3L, 1L, "3"), (10L, 2L, "10,11")), tinyEdges)
    assert(bad.contains("edge_label_disagreements"), s"got: $bad")
  }

  test("a non-minimum representative trips rep-minimality") {
    val bad = failed(
      clusters((2L, 3L, "1,2,3"), (10L, 2L, "10,11")), tinyEdges)
    assert(bad.contains("rep_not_min"), s"got: $bad")
  }

  test("phantom counts and dropped endpoints are caught") {
    // n_docs disagrees with the members list
    val m1 = failed(
      clusters((1L, 4L, "1,2,3"), (10L, 2L, "10,11")), tinyEdges)
    assert(m1.contains("n_docs_mismatch"), s"got: $m1")
    // an endpoint missing from every members list
    val m2 = failed(clusters((1L, 3L, "1,2,3"), (10L, 1L, "10")), tinyEdges)
    assert(m2.contains("uncovered_endpoints"), s"got: $m2")
    // the same id labeled twice
    val m3 = failed(
      clusters((1L, 3L, "1,2,3"), (10L, 3L, "10,11,3")), tinyEdges)
    assert(m3.contains("duplicate_labelings"), s"got: $m3")
  }
}
