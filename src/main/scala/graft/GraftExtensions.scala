package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{BinaryType, StringType}

import graft.functions.{Embedder, VectorDistance}

/** SQL surface for the engine's custom expressions.
  *
  * Two registration routes, same builders:
  *  - cluster config: `spark.sql.extensions=graft.GraftExtensions`
  *    (constructor injection at session build — the
  *    `SparkSessionExtensions` route);
  *  - programmatic: `GraftExtensions.register(spark)` on a live session.
  *
  * Registered functions:
  *  - `vector_distance(a, b, 'euclidean'|'cosine'|'dot_product'|'manhattan')`
  *    → the fused codegen [[VectorDistance]] expression
  *  - `graft_embed(text)` → the deterministic 32-d embedder column
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.injected.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  private def metricOf(e: Expression): String = e match {
    case Literal(s, StringType) => s.toString
    case other =>
      throw new IllegalArgumentException(
        s"vector_distance metric must be a string literal, got $other")
  }

  private[graft] val injected: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (
      "vector_distance",
      new ExpressionInfo(classOf[VectorDistance].getName, "vector_distance"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "vector_distance(a, b, metric)")
        VectorDistance(args(0), args(1), metricOf(args(2)))
      }),
    (
      "graft_embed",
      new ExpressionInfo(classOf[graft.functions.Embedder.type].getName, "graft_embed"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_embed(text)")
        // The fused Md5Embed expression: one digest per row by
        // construction (the earlier CreateArray-of-32-exprs form relied
        // on codegen subexpression elimination to deduplicate the digest
        // subtree — correct, but one optimizer behavior away from dim×
        // the cost; see Md5Embed's scaladoc).
        graft.functions.Md5Embed(Cast(args.head, BinaryType), Embedder.Dim)
      }),
    (
      "term_counts",
      new ExpressionInfo(classOf[graft.functions.TermCounts].getName, "term_counts"),
      (args: Seq[Expression]) => {
        require(args.length >= 2, "term_counts(text, 'term1', 'term2', ...)")
        val terms = args.tail.map {
          case Literal(s, StringType) => s.toString
          case other => throw new IllegalArgumentException(
            s"term_counts terms must be string literals, got $other")
        }
        graft.functions.TermCounts(args.head, terms)
      }),
    (
      "gram_hashes",
      new ExpressionInfo(classOf[graft.functions.GramHashes].getName, "gram_hashes"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "gram_hashes(text, k)")
        graft.functions.GramHashes(args.head, intLiteral(args(1), "gram_hashes k"))
      }),
    (
      "winnow",
      new ExpressionInfo(classOf[graft.functions.Winnow].getName, "winnow"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "winnow(grams, w)")
        graft.functions.Winnow(args.head, intLiteral(args(1), "winnow w"))
      }),
    (
      "all_shingles",
      new ExpressionInfo(classOf[graft.functions.AllShingles].getName, "all_shingles"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "all_shingles(text, k)")
        graft.functions.AllShingles(args.head, intLiteral(args(1), "all_shingles k"))
      }))

  private def intLiteral(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other =>
      throw new IllegalArgumentException(s"$what must be an int literal, got $other")
  }

  /** Programmatic registration on an existing session. */
  def register(spark: SparkSession): Unit =
    injected.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }
}
