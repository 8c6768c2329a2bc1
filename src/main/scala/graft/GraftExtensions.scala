package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Add, Cast, CreateArray, Divide, Expression, ExpressionInfo, Literal, Multiply, Pmod}
import org.apache.spark.sql.types.{BinaryType, DoubleType, FloatType, StringType}

import graft.functions.{Embedder, Md5PrefixInt, VectorDistance}

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
        // The same arithmetic as Embedder.embed, built from raw catalyst
        // nodes (a Column tree would reach the builder unresolved). Per
        // dim d: ((h*(d+1) + d) % 10000) / 10000 as float, with h = the
        // digest-byte fast path (Md5PrefixInt — no hex round trip); the
        // repeated h subtree collapses under codegen subexpression
        // elimination, so the digest runs once per row, not per dim.
        val h = Md5PrefixInt(Cast(args.head, BinaryType))
        CreateArray((0 until Embedder.Dim).map { d =>
          Cast(
            Divide(
              Cast(
                Pmod(
                  Add(Multiply(h, Literal((d + 1).toLong)), Literal(d.toLong)),
                  Literal(10000L)),
                DoubleType),
              Literal(10000.0)),
            FloatType)
        })
      }))

  /** Programmatic registration on an existing session. */
  def register(spark: SparkSession): Unit =
    injected.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }
}
