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
      }))

  /** Programmatic registration on an existing session. */
  def register(spark: SparkSession): Unit =
    injected.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }
}
