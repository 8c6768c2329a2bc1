package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, AttributeReference, Cast, EqualTo, ExprId, Expression, LessThan, Literal, NamedExpression, Or, ScalarSubquery, SortOrder}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count}
import org.apache.spark.sql.catalyst.plans.{ExistenceJoin, LeftSemi}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, GlobalLimit, Join, JoinHint, LocalLimit, LogicalPlan, Project, Sort}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{BooleanType, LongType}

import graft.functions.VectorDistance
import graft.operators.{IvfIndex, LshIndex}

/** SURVEY §4's "stretch scope" ANN plan rewrite: an OPT-IN optimizer
  * rule that recognizes the exact-kNN pattern
  *
  *   GlobalLimit(k) → LocalLimit(k) → Sort(dist ASC) →
  *     Project(..., dist = vector_distance(emb, literal query)) → child
  *
  * and substitutes the PERSISTED index artifact's probe plan — the same
  * plan `LshIndex.searchWithTable` / `IvfIndex.searchWithTable` build by
  * hand, chosen by the optimizer instead of the caller:
  *
  *   Filter(under_k_guard OR exists,
  *     ExistenceJoin(child, candidate_ids_from_pruned_artifact, id))
  *
  * Candidate ids come from the registered artifact table (the
  * partition-pruned signature table for LSH, the cell-partitioned
  * assignments table for IVF) — the corpus is scanned ONCE as the probe
  * side of a hash join against the tiny candidate set, and the under-k
  * guard is a scalar-subquery count over the ARTIFACT, not a second
  * corpus pass. An under-filled probe turns the whole predicate
  * literally true row-by-row — the exact full scan — so the rewrite can
  * never return fewer rows than the exact plan (lsh.py:199-202's
  * fallback, as plan algebra).
  *
  * Registration is by EXPLICIT token (`spark.graft.ann.probe.artifact`
  * names the registered artifact to probe): an index is only valid for
  * the table it was built from, and any implicit match (e.g. by vector
  * dim alone) would silently probe a foreign same-dim corpus with the
  * wrong index, degrading recall with no error. A registered artifact
  * whose dim or id column doesn't match the query's child plan causes NO
  * rewrite (the exact plan stands — never a wrong probe); a token naming
  * no registration fails loudly.
  *
  * Semantics are conf-gated (`spark.graft.ann.probe=true`) because the
  * rewrite is APPROXIMATE within its k (recall < 1 when the bucket holds
  * ≥ k members). Exactly like the reference, someone must opt into
  * approximate search; here it's a session conf instead of a per-call
  * index choice. Installed via `spark.experimental.extraOptimizations`
  * or an extensions `injectOptimizerRule`.
  */
object AnnProbeRule extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.ann.probe"

  /** Names the registered [[ArtifactProbe]] this conf window's kNN
    * queries probe. Empty/unset → no rewrite (an enabled rule with no
    * artifact has nothing valid to probe — the exact plan stands);
    * set but unregistered → loud failure, never a silent wrong probe. */
  val ArtifactKey = "spark.graft.ann.probe.artifact"

  private def enabled: Boolean =
    SQLConf.get.getConfString(ConfKey, "false").toBoolean

  /** A persisted index artifact registered for plan rewriting. The rule
    * never derives an index itself — it probes what the catalog
    * persisted, through a caller-supplied candidate builder that must
    * return a FRESH single-column DataFrame of candidate ids per call
    * (the rule calls it once PER REWRITE; fresh expr-ids keep two
    * rewritten branches of one query tree from colliding — within a
    * single rewrite the join side and the guard subquery share one
    * plan, see probedSort) reading the pruned artifact table — never
    * the corpus.
    * `embCol` names the vector column the artifact was built FROM: a
    * kNN over a different same-dim vector column of the same table
    * must not match this artifact (wrong-column probe = silent recall
    * collapse). */
  final case class ArtifactProbe(
      kind: String,
      idCol: String,
      dim: Int,
      candidateIds: Seq[Float] => DataFrame,
      embCol: String = "embedding")

  /** LSH probe over a persisted [[LshIndex.signatureTable]] (written
    * `partitionBy("table_idx")`): one partition-pruned scan per table
    * with the signature pushed, distinct ids. */
  def lshArtifact(
      sigTable: () => DataFrame,
      p: LshIndex.Params,
      idCol: String = "vec_id",
      embCol: String = "embedding"): ArtifactProbe =
    ArtifactProbe("lsh", idCol, p.dim, qv => {
      val sigs = LshIndex.planes(p).map(LshIndex.signatureLocal(qv.toArray, _))
      LshIndex.prunedCandidateIds(sigTable(), sigs, idCol, p.hashSize, p.maxFlips)
    }, embCol)

  /** IVF probe over persisted cell-partitioned assignments: the nProbe
    * query-nearest cells as a partition-pruned read (one row per id —
    * already distinct). Centroids are the PERSISTED quantizer, loaded
    * once at registration. */
  def ivfArtifact(
      assignments: () => DataFrame,
      cents: IndexedSeq[Array[Float]],
      nProbe: Int,
      idCol: String = "vec_id",
      embCol: String = "embedding"): ArtifactProbe = {
    require(cents.nonEmpty, "ivfArtifact needs at least one centroid")
    ArtifactProbe("ivf", idCol, cents.head.length, qv => {
      import org.apache.spark.sql.functions.col
      val probed = IvfIndex.probeCells(qv, cents, nProbe).map(_.toInt)
      assignments().where(col("cell").isin(probed: _*)).select(idCol)
    }, embCol)
  }

  /** A registration plus its ORIGIN: recovery-owned bindings (made by a
    * read-path listing) may be refreshed by a later recovery — a
    * re-listing after a cross-process version bump must re-pin to the
    * latest on-disk version, or the token would serve (or fail on) a
    * GC-doomed artifact forever. Mutation/manual bindings are owned by
    * their writer and a read path never touches them. */
  private final case class Binding(probe: ArtifactProbe, recovered: Boolean)

  @volatile private var artifacts: Map[String, Binding] = Map.empty

  /** Register a persisted index artifact under an explicit token.
    * Synchronized: `+=` on a @volatile map is a read-modify-write, and
    * two concurrent registrations must not lose one. Last registration
    * per token wins (the registry is process-global, like the rule). */
  def register(token: String, probe: ArtifactProbe): Unit = synchronized {
    require(token.nonEmpty, "artifact token must be non-empty")
    artifacts += token -> Binding(probe, recovered = false)
  }

  /** The READ-path form (startup recovery via a listing): binds when the
    * token is unbound OR bound by an earlier recovery (refreshing the
    * catalog's own pin to the latest on-disk version), and NEVER
    * replaces a mutation-time or manual registration — those writers
    * own their token. Returns whether it (re)bound. */
  def registerRecovered(token: String, probe: => ArtifactProbe): Boolean =
    synchronized {
      require(token.nonEmpty, "artifact token must be non-empty")
      if (artifacts.get(token).exists(!_.recovered)) false
      else { artifacts += token -> Binding(probe, recovered = true); true }
    }

  /** Remove a token's registration (catalog lifecycle: deleteLibrary,
    * rename, or an indexer change to a family the rule can't probe).
    * Idempotent — deregistering an absent token is a no-op. */
  def deregister(token: String): Unit = synchronized { artifacts -= token }

  /** Whether `token` currently names a registered artifact (spec
    * surface for the catalog-lifecycle registration contract). */
  def isRegistered(token: String): Boolean = artifacts.contains(token)

  def clearRegistry(): Unit = synchronized { artifacts = Map.empty }

  private def activeToken: Option[String] =
    Option(SQLConf.get.getConfString(ArtifactKey, "")).filter(_.nonEmpty)

  private def probeFor(token: String): ArtifactProbe =
    artifacts.get(token).map(_.probe).getOrElse(
      // a typo'd or forgotten registration must fail loudly, never
      // silently return exact results the caller believes are probed
      throw new IllegalArgumentException(
        s"$ArtifactKey='$token' names no registered ANN artifact — " +
          s"call AnnProbeRule.register(\"$token\", …) first " +
          s"(registered: ${artifacts.keys.toSeq.sorted.mkString(", ")})"))

  private def queryVector(lit: Literal): Option[Array[Float]] = lit.value match {
    case a: ArrayData => Some(a.toFloatArray())
    case _            => None
  }

  /** A structurally identical copy of `plan` with every ExprId re-minted
    * (consistently: each old id maps to one new id across the tree,
    * leaf-relation outputs included). The guard scalar subquery embeds
    * the same candidate plan as the ExistenceJoin build side, and Spark
    * broadly assumes unique exprIds per plan OCCURRENCE — sharing the
    * instance across the two scopes worked under current rules but is
    * fragile against attribute-rewrite changes. This keeps the single
    * optimize call (the rewrite's dominant fixed cost) and pays only a
    * cheap tree copy for the second occurrence. */
  private def freshExprIds(plan: LogicalPlan): LogicalPlan = {
    val idMap = scala.collection.mutable.HashMap.empty[ExprId, ExprId]
    def fresh(id: ExprId): ExprId =
      idMap.getOrElseUpdate(id, NamedExpression.newExprId)
    def remap(p: LogicalPlan): LogicalPlan =
      p.transformAllExpressions {
        // transformAllExpressions does NOT descend into a nested
        // subquery's LogicalPlan (e.g. a user radius pre-filter under
        // the kNN sort carrying its own scalar subquery) — recurse with
        // the SHARED id map so outer references stay consistent
        // (transformDown continues into the returned node's expression
        // children, so the subquery's OUTER references still hit the
        // AttributeReference case below with the same shared map.)
        // The SubqueryExpression's OWN exprId is re-minted too: AQE
        // plans subqueries keyed by exprId.id, so two occurrences
        // sharing one id would silently alias each other's planned
        // subquery — the exact per-occurrence invariant this helper
        // upholds.
        case s: org.apache.spark.sql.catalyst.expressions.ScalarSubquery =>
          s.copy(plan = remap(s.plan), exprId = fresh(s.exprId))
        case s: org.apache.spark.sql.catalyst.expressions.Exists =>
          s.copy(plan = remap(s.plan), exprId = fresh(s.exprId))
        case s: org.apache.spark.sql.catalyst.expressions.ListQuery =>
          s.copy(plan = remap(s.plan), exprId = fresh(s.exprId))
        case s: org.apache.spark.sql.catalyst.expressions.SubqueryExpression =>
          s.withNewPlan(remap(s.plan))
        case a: AttributeReference => a.withExprId(fresh(a.exprId))
        case a: Alias =>
          Alias(a.child, a.name)(
            fresh(a.exprId), a.qualifier, a.explicitMetadata,
            a.nonInheritableMetadataKeys)
      }
    remap(plan)
  }

  /** Idempotence guard: the optimizer runs extra rules to FIXPOINT, and
    * the rewritten shape still matches the kNN pattern — without this
    * check every iteration would stack another probe (the fresh
    * expr-ids keep the predicates from ever comparing equal).
    * Recognize the INJECTED shape only — `Or(under-k scalar subquery,
    * exists-attr of an ExistenceJoin below)` — never an arbitrary user
    * filter that happens to mention a distance expression (a radius
    * pre-filter under the kNN sort must not disable the rewrite). The
    * Or is searched ANYWHERE in the condition, not just at the top:
    * when the rule runs inside the operator-optimization batch
    * (injectOptimizerRule), CombineFilters can merge a user predicate
    * over the injected filter into `And(user, Or(guard, exists))`. */
  private def alreadyProbed(p: LogicalPlan): Boolean = p match {
    case Filter(cond, child) =>
      lazy val existsIds = child.collect {
        case Join(_, _, ExistenceJoin(a), _, _) => a.exprId
      }.toSet
      cond.exists {
        case Or(guard, probe) =>
          guard.exists(_.isInstanceOf[ScalarSubquery]) &&
            probe.exists {
              case a: Attribute => existsIds.contains(a.exprId)
              case _            => false
            }
        case _ => false
      }
    case _ => false
  }

  /** Substitute the artifact probe below `sort`'s projection; None when
    * the sort key isn't a literal-query vector distance, no artifact is
    * selected, or the artifact doesn't fit the child plan (dim or id
    * column mismatch — the exact plan stands, never a wrong probe). */
  private def probedSort(
      gl: GlobalLimit,
      sort: Sort,
      distAttr: Expression,
      proj: Project,
      child: LogicalPlan): Option[Sort] = {
    val distAlias = proj.projectList.collectFirst {
      case a @ Alias(VectorDistance(emb, q: Literal, metric), _)
          if a.toAttribute.semanticEquals(distAttr) ||
            distAttr.references.contains(a.toAttribute) =>
        (emb, q, metric)
    }
    // the artifact must fit the query EXACTLY: the distance's vector
    // operand must be the column the artifact was built from (a
    // different same-dim vector column of the same table would probe
    // the wrong index — silent recall collapse), the dims must match,
    // and the child must expose the artifact's id join key. Any
    // mismatch → no rewrite, the exact plan stands.
    // only a BARE attribute of the artifact's column name matches: a
    // derived vector expression (negation, normalization, a slice) over
    // that column is different DATA than what was indexed, even though
    // it references the same column — and a renamed alias of the true
    // column collapses back to the underlying attribute before this
    // rule runs, so the attribute name is the right identity here
    def embColMatches(emb: Expression, wanted: String): Boolean = emb match {
      case a: Attribute => SQLConf.get.resolver(a.name, wanted)
      case _            => false
    }
    for {
      (emb, qLit, _) <- distAlias
      qv <- queryVector(qLit)
      token <- activeToken
      probe = probeFor(token)
      if qv.length == probe.dim
      if embColMatches(emb, probe.embCol)
      idAttr <- child.output.find(a =>
        SQLConf.get.resolver(a.name, probe.idCol))
    } yield {
      // ONE optimized candidate plan, built with a single
      // analyzer+optimizer pass (~0.15 s — the rewrite's dominant fixed
      // cost at demo scale) and consumed twice: as the hash-join build
      // side here, and inside the guard's scalar subquery below via a
      // fresh-exprId copy ([[freshExprIds]] — Spark assumes unique
      // exprIds per plan occurrence, so the subquery scope must not
      // share ids with the main tree). Both read the pruned artifact,
      // the corpus is scanned exactly once (the join's probe side), and
      // the artifact scans stay VISIBLE in the final plan (auditable:
      // PlanAuditSpec pins their partition pruning). Injected
      // OPTIMIZED: user rules run after the main batches, so an
      // analyzed subtree would carry nodes the planner can't take
      // (distinct()'s Deduplicate, normally lowered to Aggregate
      // earlier). Eagerly materializing-and-sharing the candidates at
      // rewrite time would be cheaper still but hides the probe from
      // the plan (an ExistingRDD leaf) — the wrong trade for an
      // optimizer rule whose whole claim is the plan it produces.
      val candPlan = probe.candidateIds(qv.toSeq).queryExecution.optimizedPlan
      val exists =
        AttributeReference("graft_ann_cand_exists", BooleanType, nullable = false)()
      val join = Join(child, candPlan, ExistenceJoin(exists),
        Some(EqualTo(idAttr, candPlan.output.head)), JoinHint.NONE)
      // under-k fallback: count the probe's SURVIVING candidates in an
      // uncorrelated scalar subquery; an under-filled probe turns the
      // whole predicate true and the plan is the exact scan. When the
      // child is a bare scan the count runs over the ARTIFACT alone
      // (distinct ids — never a corpus pass, and exactly the oracle's
      // `count(cand) < k`); a child carrying its own operators (e.g. a
      // user pre-filter under the kNN sort) must count candidates that
      // SURVIVE those operators instead — the artifact count alone
      // could exceed k while the filtered probe under-fills, silently
      // returning fewer rows than the exact plan would.
      @annotation.tailrec
      def isBareScan(p: LogicalPlan): Boolean = p match {
        case Project(_, c) => isBareScan(c)
        case _ => p.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LeafNode]
      }
      val guardChild =
        if (isBareScan(child)) candPlan
        else Join(child, candPlan, LeftSemi,
          Some(EqualTo(idAttr, candPlan.output.head)), JoinHint.NONE)
      // the whole guard tree (which embeds the SAME candidate plan
      // instance as the join side, and for non-bare children the same
      // `child` instance too) gets one consistent fresh-exprId remap —
      // the subquery scope never shares an id with the main tree
      val candCount = freshExprIds(Aggregate(
        Nil,
        Seq(Alias(
          AggregateExpression(Count(Seq(Literal(1))), Complete, isDistinct = false),
          "cand_n")()),
        guardChild))
      val underK: Expression =
        LessThan(ScalarSubquery(candCount), Cast(gl.limitExpr, LongType))
      sort.copy(child = proj.copy(child = Filter(Or(underK, exists), join)))
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    // The optimizer may push a post-limit projection (e.g. rounding the
    // distance for output) between LocalLimit and Sort, so both
    //   GlobalLimit → LocalLimit → Sort → Project
    //   GlobalLimit → LocalLimit → Project → Sort → Project
    // are the exact-kNN shape.
    plan.transformDown {
      case gl @ GlobalLimit(_, ll @ LocalLimit(_, mid)) =>
        val rewritten = mid match {
          case sort @ Sort(Seq(SortOrder(distAttr, Ascending, _, _), _*), true,
                proj @ Project(_, child), _) if !alreadyProbed(child) =>
            probedSort(gl, sort, distAttr, proj, child)
              .map(s => ll.copy(child = s))
          case mp @ Project(_,
                sort @ Sort(Seq(SortOrder(distAttr, Ascending, _, _), _*), true,
                  proj @ Project(_, child), _)) if !alreadyProbed(child) =>
            probedSort(gl, sort, distAttr, proj, child)
              .map(s => ll.copy(child = mp.copy(child = s)))
          case _ => None
        }
        rewritten.map(c => gl.copy(child = c)).getOrElse(gl)
    }
  }
}
