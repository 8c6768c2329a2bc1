package graft

import org.apache.spark.sql.catalyst.expressions.{Expression, HigherOrderFunction, LambdaFunction, NamedLambdaVariable}
import org.apache.spark.sql.catalyst.expressions.{Crc32, HiveHash, Md5, Murmur3Hash, Sha1, Sha2, XxHash64}

/** Structural audit for the expensive-expression-in-HOF-lambda hazard
  * (round-15 verdict #5): an expression referenced inside a
  * higher-order-function lambda re-evaluates PER ELEMENT, and Spark's
  * HOFs have no codegen — so a loop-invariant subtree that is itself
  * expensive (a digest, another HOF aggregate, one of this repo's fused
  * kernels) turns O(dim) work into O(dim²), interpreted. Three
  * instances were found reactively across rounds 14–15:
  *
  *  1. q_hnsw_recall's composed normalizer — `transform(a, x => x /
  *     l2Norm(a))`: the bound norm (an ArrayAggregate over `a`) sat
  *     inside the lambda, 58.6 of the row's 65.7 s at ×100.
  *  2. Embedder.normalizeCol — same shape on the lexical ingest path.
  *  3. CollapseProject inlining a singly-referenced md5 digest into a
  *     zip_with lambda (q_embed_neardup_vec's replica noise) — ~64 M
  *     redundant digests at ×100.
  *
  * The audit walks the OPTIMIZED plan of every SparkEntry query (so it
  * sees what CollapseProject and friends actually left in the lambda,
  * not what the builder wrote) and fails on any hazard-class subtree
  * inside a LambdaFunction body that references NO lambda variable:
  * referencing none means the subtree is invariant across every
  * enclosing element loop and should have been computed once outside
  * (a fused Expression or a separate projection the optimizer cannot
  * re-inline). All three retro instances trip this rule; per-element
  * digests like `transform(shingles, g => xxhash64(g))` do not (the
  * digest consumes the lambda variable).
  */
class LambdaHazardSpec extends SparkSpec {

  /** Expensive-when-re-evaluated-per-element classes: built-in digests,
    * any higher-order function (an inner HOF loop makes the outer loop
    * quadratic), and every fused kernel in graft.functions (each exists
    * precisely because it is too expensive to re-evaluate). */
  private def isHazard(e: Expression): Boolean = e match {
    case _: Md5 | _: Sha1 | _: Sha2 | _: Crc32 | _: XxHash64 |
        _: Murmur3Hash | _: HiveHash => true
    case _: HigherOrderFunction => true
    case _ => e.getClass.getName.startsWith("graft.functions.")
  }

  /** FREE lambda variables of a subtree: variables used minus variables
    * bound by LambdaFunctions inside the subtree itself. A nested HOF's
    * own (acc, x) variables must not make an otherwise-invariant
    * aggregate look loop-dependent — the retro q_hnsw_recall hazard was
    * exactly `aggregate(a, …)` inside a transform lambda, and every
    * variable it touches is its own. */
  private def freeLambdaVars(e: Expression): Set[Long] = {
    val used = e.collect { case v: NamedLambdaVariable => v.exprId.id }.toSet
    val bound = e.collect { case lf: LambdaFunction =>
      lf.arguments.collect { case v: NamedLambdaVariable => v.exprId.id }
    }.flatten.toSet
    used -- bound
  }

  /** Hazard subtrees inside `lambda`'s body that are loop-invariant
    * (no free lambda variable — nothing ties their value to any
    * enclosing element loop). The walk stops descending once a hazard
    * is reported so one inlined digest does not multiply into a report
    * per nested node. */
  private def invariantHazards(lambda: LambdaFunction): Seq[Expression] = {
    def walk(e: Expression): Seq[Expression] =
      if (isHazard(e) && freeLambdaVars(e).isEmpty) Seq(e)
      else e.children.flatMap(walk)
    walk(lambda.function)
  }

  test("no optimized query plan re-evaluates an expensive invariant inside a HOF lambda") {
    val violations = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, build) =>
        val plan = build(spark, sfDir).queryExecution.optimizedPlan
        plan.collectWithSubqueries { case node => node }.flatMap { node =>
          node.expressions.flatMap { root =>
            root.collect { case lf: LambdaFunction => lf }.flatMap { lf =>
              invariantHazards(lf).map(h =>
                s"$name: ${h.getClass.getSimpleName} invariant inside lambda: " +
                  s"${h.toString.take(120)}")
            }
          }
        }
    }
    assert(violations.isEmpty,
      s"\n${violations.distinct.mkString("\n")}\n" +
        "^ expensive loop-invariant expression(s) inside a HOF lambda — " +
        "each re-evaluates per array element, interpreted. Fuse the term " +
        "(graft.functions pattern) or bind it where CollapseProject " +
        "cannot re-inline it (see L2NormalizeFloat's scaladoc).")
  }

  test("the audit rule retro-catches the known composed-normalizer shape") {
    // the round-15 q_hnsw_recall hazard, reconstructed: the bound norm
    // aggregate referenced inside the transform lambda. The rule must
    // flag it — this pins the audit against silently going blind if
    // Catalyst's lambda representation changes under a Spark upgrade.
    import org.apache.spark.sql.functions._
    import graft.functions.VectorFunctions
    val df = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(VectorFunctions.l2Normalize(col("embedding")).as("e"))
    val lambdas = df.queryExecution.optimizedPlan
      .expressions.flatMap(_.collect { case lf: LambdaFunction => lf })
    assert(lambdas.exists(lf => invariantHazards(lf).nonEmpty),
      "the audit no longer flags the composed l2Normalize shape — " +
        "the hazard detector went blind")
  }
}
