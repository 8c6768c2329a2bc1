package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, And, Ascending, EqualTo, Expression, Literal, Or, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, GlobalLimit, LocalLimit, LogicalPlan, Project, Sort}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.internal.SQLConf

import graft.functions.{LshSignature, VectorDistance}
import graft.operators.LshIndex

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
  * Semantics are deliberately conf-gated (`spark.graft.ann.probe=true`)
  * because the rewrite is APPROXIMATE (recall < 1, and — unlike the
  * runtime path — a rule cannot count candidates, so there is no
  * under-k fallback). Exactly like the reference, someone must opt into
  * approximate search; here it's a session conf instead of a per-call
  * index choice. Installed via `spark.experimental.extraOptimizations`
  * or an extensions `injectOptimizerRule`.
  */
object AnnProbeRule extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.ann.probe"

  private def enabled: Boolean =
    SQLConf.get.getConfString(ConfKey, "false").toBoolean

  private def queryVector(lit: Literal): Option[Array[Float]] = lit.value match {
    case a: ArrayData => Some(a.toFloatArray())
    case _            => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformDown {
      case gl @ GlobalLimit(_,
            ll @ LocalLimit(_,
              sort @ Sort(Seq(SortOrder(distAttr, Ascending, _, _), _*), true,
                proj @ Project(projList, child), _))) =>
        val distAlias = projList.collectFirst {
          case a @ Alias(VectorDistance(emb, q: Literal, metric), _)
              if a.toAttribute.semanticEquals(distAttr) ||
                distAttr.references.contains(a.toAttribute) =>
            (emb, q, metric)
        }
        distAlias.flatMap { case (emb, qLit, metric) =>
          queryVector(qLit).map { qv =>
            val params = LshIndex.Params(dim = qv.length)
            val planes = LshIndex.planes(params)
            val sigs = planes.map(LshIndex.signatureLocal(qv, _))
            val cond: Expression = planes.indices
              .map(t =>
                EqualTo(LshSignature(emb, planes(t)), Literal(sigs(t))): Expression)
              .reduce(Or)
            gl.copy(child =
              ll.copy(child =
                sort.copy(child = proj.copy(child = Filter(cond, child)))))
          }
        }.getOrElse(gl)
    }
  }
}
