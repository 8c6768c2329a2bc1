package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic-scale invariant gate for q_dedup_clusters — the one query
  * whose DuckDB oracle is infeasible past sf0.1 (connected components
  * via a recursive CTE materializes O(component²) rows, and DuckDB 1.0
  * has no keyed recursion), so at ×10/×100 it is verified by
  * SELF-CONSISTENCY INVARIANTS that together PROVE the output is the
  * exact min-labeled connected components of the persisted edge set:
  *
  *   1. membership: every cluster_rep appears in its own members list,
  *      and n_docs equals the members-list size (no phantom counts);
  *   2. rep-minimality: cluster_rep == min(members) per cluster;
  *   3. edge agreement: for EVERY persisted near-dup edge, both
  *      endpoints carry the same cluster label (equivalently: one more
  *      propagation round changes zero labels — the fixpoint check the
  *      query also enforces internally via its observed `changed`);
  *   4. coverage: the labeled id set equals the edge-endpoint id set
  *      exactly (each endpoint in exactly one cluster);
  *   5. connectivity: every cluster is CONNECTED over its own intra-
  *      cluster edges — an exact per-label union-find, one cluster per
  *      task (the largest clone-family clique is ~10^5-10^6 edges,
  *      trivially task-local). Without this, an over-merging regression
  *      (two disjoint components under one label) would pass 1-4.
  *
  * Soundness: (3) makes every component lie within one cluster, (5)
  * makes every cluster lie within one component, (4) matches the node
  * sets — so clusters = components exactly, labeled by their minimum
  * id (1,2). This checks ALL components, not a sample. Any violation
  * exits nonzero (the scale gate fails loudly).
  *
  * The invariant computation lives in [[invariants]] so ClusterGateSpec
  * runs the SAME proof in `sbt test` (sf0.001 corpus + seeded
  * tampered-clustering negatives) — a propagation regression is caught
  * at commit time, not first at gate time.
  *
  * Usage: runMain graft.tools.ClusterGate <sfDir>
  */
object ClusterGate {

  /** Summary counts + the invariant rows (name, value, expected) for a
    * clustering `clusters` (cluster_rep, n_docs, members csv) claimed
    * over undirected edge set `edges` (doc_a, doc_b). Every expected
    * value is 0 — any nonzero row is a disproof. */
  def invariants(
      clusters: DataFrame,
      edges: DataFrame): (Long, Long, Long, Seq[(String, Long, Long)]) = {
    val spark = clusters.sparkSession

    // one pass over the (bounded: one row per cluster) output for the
    // per-cluster invariants; members re-splits to ids
    val withIds = clusters.select(
      col("cluster_rep"), col("n_docs"),
      transform(split(col("members"), ","), _.cast("long")).as("ids"))
    val perCluster = withIds.agg(
      count(lit(1)).as("n_clusters"),
      sum(when(array_contains(col("ids"), col("cluster_rep")), 0L)
        .otherwise(1L)).as("rep_not_member"),
      sum(when(array_min(col("ids")) === col("cluster_rep"), 0L)
        .otherwise(1L)).as("rep_not_min"),
      sum(when(size(col("ids")).cast("long") === col("n_docs"), 0L)
        .otherwise(1L)).as("n_docs_mismatch"),
      sum(col("n_docs")).as("n_labeled")).head()

    // labels table: (id, lbl) from the members lists
    val labels = withIds
      .select(col("cluster_rep").as("lbl"), explode(col("ids")).as("id"))
      .localCheckpoint(true)

    // every persisted edge agrees on labels across its endpoints
    val disagree = edges
      .join(labels.select(col("id").as("doc_a"), col("lbl").as("la")), "doc_a")
      .join(labels.select(col("id").as("doc_b"), col("lbl").as("lb")), "doc_b")
      .where(col("la") =!= col("lb"))
      .count()

    // coverage: labeled ids == edge endpoint ids, each labeled once
    val endpoints = edges.select(col("doc_a").as("id"))
      .unionByName(edges.select(col("doc_b").as("id"))).distinct()
    val nEndpoints = endpoints.count()
    val nLabels = labels.count()
    val nDistinctLabeled = labels.select("id").distinct().count()
    val uncovered = endpoints.join(labels, Seq("id"), "left_anti").count()

    // connectivity: per-label union-find over intra-cluster edges —
    // each cluster must form ONE component over its own edges and its
    // edge-node set must be the full member set (every member has at
    // least one same-label edge). This is the check that catches
    // OVER-merging, which invariants 1-4 are blind to.
    import spark.implicits._
    val labeledEdges = edges
      .join(labels.select(col("id").as("doc_a"), col("lbl")), "doc_a")
      .select(col("lbl"), col("doc_a"), col("doc_b"))
      .as[(Long, Long, Long)]
    val connectivity = labeledEdges
      .groupByKey(_._1)
      .mapGroups { (lbl, it) =>
        val parent = scala.collection.mutable.HashMap.empty[Long, Long]
        def find(x: Long): Long = {
          var r = x
          while (parent.getOrElse(r, r) != r) r = parent(r)
          var c = x
          while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
          r
        }
        it.foreach { case (_, a, b) =>
          parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val nodes = parent.keys.toSeq
        (lbl, nodes.size.toLong, nodes.map(find).distinct.size.toLong)
      }
      .toDF("lbl", "edge_nodes", "components")
    val connStats = connectivity
      .join(withIds.select(col("cluster_rep").as("lbl"), col("n_docs")), "lbl")
      .agg(
        sum(when(col("components") === 1L, 0L).otherwise(1L))
          .as("disconnected_clusters"),
        sum(when(col("edge_nodes") === col("n_docs"), 0L).otherwise(1L))
          .as("edge_node_mismatch"),
        count(lit(1)).as("n_conn_checked")).head()

    val checks = Seq(
      ("rep_not_member", perCluster.getAs[Long]("rep_not_member"), 0L),
      ("rep_not_min", perCluster.getAs[Long]("rep_not_min"), 0L),
      ("n_docs_mismatch", perCluster.getAs[Long]("n_docs_mismatch"), 0L),
      ("edge_label_disagreements", disagree, 0L),
      ("uncovered_endpoints", uncovered, 0L),
      ("duplicate_labelings", nLabels - nDistinctLabeled, 0L),
      ("labeled_minus_endpoints", nLabels - nEndpoints, 0L),
      ("disconnected_clusters", connStats.getAs[Long]("disconnected_clusters"), 0L),
      ("conn_edge_node_mismatch", connStats.getAs[Long]("edge_node_mismatch"), 0L),
      ("conn_clusters_unchecked",
        perCluster.getAs[Long]("n_clusters") - connStats.getAs[Long]("n_conn_checked"), 0L))
    (perCluster.getAs[Long]("n_clusters"), perCluster.getAs[Long]("n_labeled"),
      nEndpoints, checks)
  }

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "target/sf1-synth"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .appName("cluster-gate")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val clusters = graft.SparkEntry.queries("q_dedup_clusters")(spark, dir)
      .localCheckpoint(true)
    val edges = spark.read.parquet(
      graft.SparkEntry.nearDupEdgesPath(spark, dir))
    val (nClusters, nLabeled, nEndpoints, checks) = invariants(clusters, edges)
    val bad = checks.filter { case (_, v, want) => v != want }
    println(s"[cluster-gate] $dir clusters=$nClusters " +
      s"labeled=$nLabeled endpoints=$nEndpoints")
    checks.foreach { case (n, v, _) => println(f"[cluster-gate]   $n%-28s $v") }
    spark.stop()
    if (bad.nonEmpty) {
      // stdout, not stderr: the scale gate greps stdout and discards
      // stderr — a swallowed failure summary is not "failing loudly"
      println(
        s"[cluster-gate] FAILED: ${bad.map(b => s"${b._1}=${b._2}").mkString(", ")}")
      sys.exit(1)
    }
    println("[cluster-gate] PASS — output is the exact min-labeled connected components")
  }
}
