package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, And, ArrayMin, ArrayPosition, Ascending, Cast, CreateArray, EqualTo, Expression, In, LessThan, Literal, Or, ScalarSubquery, SortOrder}
import org.apache.spark.sql.types.{ArrayType, FloatType, LongType}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, GlobalLimit, LocalLimit, LogicalPlan, Project, Sort}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.internal.SQLConf

import graft.functions.{LshSignature, VectorDistance}
import graft.operators.{IvfIndex, LshIndex}

/** SURVEY §4's "stretch scope" ANN plan rewrite: an OPT-IN optimizer
  * rule that recognizes the exact-kNN pattern
  *
  *   GlobalLimit(k) → LocalLimit(k) → Sort(dist ASC) →
  *     Project(..., dist = vector_distance(emb, literal query)) → child
  *
  * and injects an LSH sign-signature candidate filter under the
  * projection, turning the full-corpus distance scan into a bucket
  * probe + exact re-rank — the same plan LshIndex.search builds by
  * hand, chosen by the optimizer instead of the caller.
  *
  * The runtime path's under-k fallback is preserved: the injected
  * filter is `candidate_count < k OR signature_match`, where
  * candidate_count is an uncorrelated scalar subquery counting the
  * probe's bucket members. An under-filled probe degenerates the
  * predicate to literally-true row-by-row — the exact full scan — so
  * the rewrite can never return fewer rows than the exact plan. The
  * honest cost: the count is one extra signature pass over the child
  * (a rule has no persisted signature table to count instead; the
  * catalog path, LshIndex.search, counts materialized candidates).
  *
  * Semantics are deliberately conf-gated (`spark.graft.ann.probe=true`)
  * because the rewrite is APPROXIMATE within its k (recall < 1 when the
  * bucket holds ≥ k members). Exactly like the reference, someone must
  * opt into approximate search; here it's a session conf instead of a
  * per-call index choice. Installed via
  * `spark.experimental.extraOptimizations` or an extensions
  * `injectOptimizerRule`.
  */
object AnnProbeRule extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.ann.probe"

  /** Which persisted index family the rewrite probes: "lsh" (default —
    * inline sign-signature buckets, no artifact needed) or "ivf" (the
    * registered PERSISTED coarse quantizer). Explicit, not auto: the
    * two probes have different recall behavior and a caller opting into
    * approximate search picks the index, exactly like the reference's
    * per-library indexer choice. */
  val KindKey = "spark.graft.ann.probe.kind"

  private def enabled: Boolean =
    SQLConf.get.getConfString(ConfKey, "false").toBoolean

  private def kind: String =
    SQLConf.get.getConfString(KindKey, "lsh").toLowerCase

  /** A PERSISTED IVF quantizer a caller loaded from catalog/index
    * artifacts and registered for plan rewriting, keyed by vector dim
    * (the rule's analog of catalog metadata: it never derives a
    * quantizer itself — it reuses what was persisted, as literals). */
  final case class IvfProbe(cents: IndexedSeq[Array[Float]], nProbe: Int)

  @volatile private var ivfProbes: Map[Int, IvfProbe] = Map.empty

  /** Register a persisted IVF quantizer (e.g. loaded via
    * `LibraryCatalog.centroidsTable` / a centroids parquet artifact)
    * for `kind=ivf` rewrites of queries over same-dim vectors.
    * Synchronized: `+=` on a @volatile map is a read-modify-write, and
    * two concurrent registrations must not lose one. Last registration
    * per dim wins (the registry is process-global, like the rule). */
  def registerIvf(cents: IndexedSeq[Array[Float]], nProbe: Int): Unit =
    synchronized {
      require(cents.nonEmpty, "registerIvf needs at least one centroid")
      ivfProbes += cents.head.length -> IvfProbe(cents, nProbe)
    }

  def clearIvfRegistry(): Unit = synchronized { ivfProbes = Map.empty }

  private def queryVector(lit: Literal): Option[Array[Float]] = lit.value match {
    case a: ArrayData => Some(a.toFloatArray())
    case _            => None
  }

  /** Idempotence guard: the optimizer runs extra rules to FIXPOINT, and
    * the rewritten shape still matches the kNN pattern — without this
    * check every iteration would stack another probe filter (the fresh
    * subquery expr-ids keep the predicates from ever comparing equal). */
  /** Recognize the INJECTED probe shape only — `Or(under-k scalar
    * subquery, probe predicate)` — never an arbitrary user filter that
    * happens to mention a distance expression (a radius pre-filter
    * under the kNN sort must not disable the rewrite). The Or is
    * searched ANYWHERE in the condition, not just at the top: when the
    * rule runs inside the operator-optimization batch
    * (injectOptimizerRule), CombineFilters can merge a user predicate
    * over the injected filter into `And(user, Or(guard, probe))`, and a
    * top-level-only check would re-inject a probe every fixpoint
    * iteration. */
  private def alreadyProbed(p: LogicalPlan): Boolean = p match {
    case Filter(cond, _) =>
      cond.exists {
        case Or(guard, probe) =>
          guard.exists(_.isInstanceOf[ScalarSubquery]) &&
            probe.exists(e =>
              e.isInstanceOf[LshSignature] || e.isInstanceOf[VectorDistance])
        case _ => false
      }
    case _ => false
  }

  /** Probe predicate for the configured index kind; None when the kind
    * needs a registered artifact that isn't there (no rewrite — the
    * exact plan stands). */
  private def probeCond(emb: Expression, qv: Array[Float]): Option[Expression] =
    kind match {
      case "ivf" =>
        ivfProbes.get(qv.length).map { p =>
          // per-row coarse cell = first-minimum centroid (ArrayPosition
          // of ArrayMin — the oracle's list_position(list_min) tie-break;
          // VectorDistance is the bitwise twin of the composed euclid the
          // persisted assignments were computed with), membership in the
          // nProbe cells nearest the query
          val dists = p.cents.map(c =>
            VectorDistance(
              emb,
              Literal.create(c.toSeq, ArrayType(FloatType, containsNull = false)),
              "euclidean"): Expression)
          val arr = CreateArray(dists)
          val probed = IvfIndex.probeCells(qv.toSeq, p.cents, p.nProbe)
          In(ArrayPosition(arr, ArrayMin(arr)),
            probed.map(c => Literal(c + 1L): Expression))
        }
      case "lsh" =>
        val params = LshIndex.Params(dim = qv.length)
        val planes = LshIndex.planes(params)
        val sigs = planes.map(LshIndex.signatureLocal(qv, _))
        Some(planes.indices
          .map(t =>
            EqualTo(LshSignature(emb, planes(t)), Literal(sigs(t))): Expression)
          .reduce(Or))
      case other =>
        // the two probes have different recall behavior — a typo must
        // fail loudly, never silently probe the wrong index family
        throw new IllegalArgumentException(
          s"$KindKey=$other is not a known probe kind (lsh | ivf)")
    }

  /** Inject the probe filter + under-k guard below `sort`'s projection;
    * None when the sort key isn't a literal-query vector distance. */
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
    distAlias.flatMap { case (emb, qLit, _) =>
      queryVector(qLit).flatMap { qv =>
        probeCond(emb, qv).map { cond =>
          // under-k fallback: count the probe's members in an
          // uncorrelated scalar subquery; an under-filled probe turns
          // the whole predicate true and the plan is the exact scan
          val candCount = Aggregate(
            Nil,
            Seq(Alias(
              AggregateExpression(Count(Seq(Literal(1))), Complete, isDistinct = false),
              "cand_n")()),
            Filter(cond, child))
          val underK: Expression =
            LessThan(ScalarSubquery(candCount), Cast(gl.limitExpr, LongType))
          sort.copy(child = proj.copy(child = Filter(Or(underK, cond), child)))
        }
      }
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
