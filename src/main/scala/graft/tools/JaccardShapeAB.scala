package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.JaccardJoin

/** Scratch decomposition probe for q_ngram_jaccard at synthetic scale
  * (round-13 verdict #3: the x100 number's 39 s in-record spread and
  * its cost decomposition were a label, not a measurement). Variants
  * share the EXACT shipped stages via JaccardJoin's factored internals:
  *
  *   A  full        — selfJoin as shipped (enumeration + both verify
  *                    attaches + array_intersect + threshold filter)
  *   B  enum-only   — candidatePairsOf alone (prefix build + candidate
  *                    equi-join with positional/pe filters); no verify
  *   C  attach-triv — candidates + BOTH SHUFFLE_HASH set attaches, with
  *                    the intersect swapped for an element_at touch of
  *                    each array (non-foldable, forces the full arrays
  *                    through the exchange like A) — C-B is the verify
  *                    ATTACH/payload cost, A-C the intersection FLOPs
  *
  * min-of-iters per variant is the steal-robust reading (contention
  * only ever inflates); per-iter prints expose the variance by stage.
  * Usage: runMain graft.tools.JaccardShapeAB [sfDir] [iters] [variants]
  */
object JaccardShapeAB {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "target/sf10-synth"
    val iters = if (args.length > 1) args(1).toInt else 3
    val variants = if (args.length > 2) args(2) else "ABC"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false")
      .appName("jaccard-shape-ab").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val (k, tNum, tDen) = (3, 4, 5) // q_ngram_jaccard's exact params
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println("  %s: %7.2f s  (%d rows)".formatLocal(
        java.util.Locale.ROOT, label, (System.nanoTime() - t0) / 1e9, n))
    }
    for (i <- 1 to iters) {
      println(s"ITER $i")
      if (variants.contains("A")) time("A full         ") {
        JaccardJoin.selfJoin(docs, "doc_id", "text", k, tNum, tDen).count()
      }
      if (variants.contains("B")) time("B enum-only    ") {
        val sets = JaccardJoin.shingleSets(docs, "doc_id", "text", k)._2
        JaccardJoin.candidatePairsOf(sets, tNum, tDen,
          JaccardJoin.DefaultMaxPrefixLen).count()
      }
      if (variants.contains("C")) time("C attach-trivial") {
        val sets = JaccardJoin.shingleSets(docs, "doc_id", "text", k)._2
        val candidates = JaccardJoin.candidatePairsOf(sets, tNum, tDen,
          JaccardJoin.DefaultMaxPrefixLen)
        candidates
          .join(sets.select(col("doc_id").as("doc_a"), col("s").as("sa"))
            .hint("SHUFFLE_HASH"), "doc_a")
          .join(sets.select(col("doc_id").as("doc_b"), col("s").as("sb"))
            .hint("SHUFFLE_HASH"), "doc_b")
          // touch one element of EACH array: non-foldable and NEVER
          // false (x*0 is exactly 0.0 for every finite long-cast — a
          // plain sum threshold mis-dropped ~17% of rows whose two
          // xxhash64 values summed below it), keeping the full arrays
          // flowing through the attaches exactly as A's intersect does
          .where(element_at(col("sa"), 1).cast("double") * lit(0.0) +
            element_at(col("sb"), 1).cast("double") * lit(0.0) >= lit(-1.0))
          .count()
      }
    }
    spark.stop()
  }
}
