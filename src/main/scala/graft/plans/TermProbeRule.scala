package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{And, ArrayContains, Attribute, EqualTo, Expression, Literal, StringSplit}
import org.apache.spark.sql.catalyst.plans.LeftSemi
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, JoinHint, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.InvertedIndex

/** The lexical twin of [[AnnProbeRule]]: an OPT-IN optimizer rule that
  * recognizes token-membership predicates over the corpus text
  *
  *   Filter(array_contains(split(text, ' ', -1), 'term') AND …, child)
  *
  * and rewrites them into a LEFT SEMI join against the PERSISTED
  * positional inverted index ([[InvertedIndex]]) — the full-text scan
  * becomes a bucket-pruned postings lookup chosen by the OPTIMIZER
  * instead of the caller. Unlike the ANN rewrite this one is EXACT (the
  * index is a lossless projection of the corpus), so no fallback guard
  * is needed; the remaining non-term conjuncts stay as a Filter above
  * the join.
  *
  * Gated on two confs because an index is only valid for the table it
  * was built from: `spark.graft.term.probe=true` turns the rule on and
  * `spark.graft.term.index.path` names the postings table. The caller's
  * contract (documented, as with every index): enable it only around
  * queries over the indexed corpus, whose child plan exposes the
  * index's `doc_id` join key. Idempotent by construction — the rewrite
  * removes the term predicates it consumed, so the fixpoint run cannot
  * match twice.
  */
object TermProbeRule extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.term.probe"
  val PathKey = "spark.graft.term.index.path"

  private def enabled: Boolean =
    SQLConf.get.getConfString(ConfKey, "false").toBoolean

  private def indexPath: Option[String] =
    Option(SQLConf.get.getConfString(PathKey, "")).filter(_.nonEmpty)

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other     => Seq(other)
  }

  /** `array_contains(split(<attr>, ' ', -1), '<literal term>')` — the
    * exact tokenizer discipline the index is built with; any other
    * separator or a non-literal term does not match. */
  private def termOf(e: Expression): Option[String] = e match {
    case ArrayContains(
          StringSplit(_: Attribute, Literal(sep: UTF8String, _), Literal(lim, _)),
          Literal(t: UTF8String, _))
        if sep.toString == " " && lim == -1 =>
      Some(t.toString)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    indexPath match {
      case None => plan
      case Some(path) =>
        plan.transformDown {
          case f @ Filter(cond, child) =>
            val (termPreds, rest) =
              conjuncts(cond).partition(termOf(_).isDefined)
            val docIdAttr = child.output.find(_.name == "doc_id")
            if (termPreds.isEmpty || docIdAttr.isEmpty) f
            else {
              val terms = termPreds.flatMap(termOf)
              val spark = SparkSession.active
              // inject the OPTIMIZED lookup subtree: user rules run after
              // the main batches, so an analyzed subtree would carry
              // nodes the planner can't take (e.g. distinct()'s
              // Deduplicate, normally lowered to Aggregate earlier).
              // No recursion risk: the lookup's own Filters are term
              // IN-lists, not array_contains(split(…)).
              val lookup = InvertedIndex
                .conjunctiveSearch(InvertedIndex.read(spark, path), terms)
                .queryExecution.optimizedPlan
              val rightKey = lookup.output.find(_.name == "doc_id").get
              val joined = Join(child, lookup, LeftSemi,
                Some(EqualTo(docIdAttr.get, rightKey)), JoinHint.NONE)
              rest.reduceOption(And).map(Filter(_, joined)).getOrElse(joined)
            }
        }
    }
  }
}
