package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance ≤ 1 key join via deletion-neighborhood blocking (the
  * FastSS family). Two strings with Levenshtein distance ≤ 1 ALWAYS
  * share a member of {s} ∪ del1(s) (equal → s itself; one substitution
  * → delete the differing position on both sides; one insertion /
  * deletion → the shorter string is a del1 of the longer), so an
  * EQUI-join on the variant string is a complete candidate generator —
  * a raw `levenshtein(a, b) <= 1` join predicate would plan a
  * BroadcastNestedLoopJoin and die at scale, while this shape is
  * |key|+1 variant rows per input row through a hash join, then an
  * exact `levenshtein` verify on the bounded candidate set.
  *
  * Reference relevance: near-dup detection tolerates small edits; this
  * is the exact-threshold cousin of the MinHash path
  * (core/indexers/lsh.py banding) for short keys (titles, ids, names).
  */
object FuzzyJoin {

  /** `{key} ∪ {key with char i deleted}` — `array_union` also dedupes
    * (deleting either of two equal adjacent chars yields one variant).
    * The post-deletion suffix length is taken from `length(key)` itself
    * (an over-estimate `substr` clamps), so arbitrarily long keys keep
    * complete variant sets — no silent truncation cap. */
  def deletionVariants(key: Column): Column =
    array_union(
      array(key),
      transform(sequence(lit(1), length(key)), i =>
        concat(
          key.substr(lit(1), i - lit(1)),
          key.substr(i + lit(1), length(key)))))

  /** All (left, right) row pairs whose keys have Levenshtein distance
    * ≤ 1. Output: left's columns then right's (caller disambiguates
    * names). Both sides explode to |key|+1 variant rows; the candidate
    * equi-join on the variant string is COMPLETE for ED ≤ 1 (see
    * object doc), and the final verify keeps exactness. */
  def ed1Join(
      left: DataFrame,
      leftKey: String,
      right: DataFrame,
      rightKey: String): DataFrame = {
    val lv = left.select(
      struct(left.columns.map(col): _*).as("__l"),
      explode(deletionVariants(col(leftKey))).as("__variant"))
    val rv = right.select(
      struct(right.columns.map(col): _*).as("__r"),
      explode(deletionVariants(col(rightKey))).as("__variant"))
    // verify BEFORE the distinct: ED=2 false candidates (pairs sharing a
    // variant but not within distance 1) would otherwise ride the
    // dedup's exchange as full row-struct pairs — the filter commutes
    // with distinct and thins the one wide shuffle this join has
    lv.join(rv, Seq("__variant"))
      .select(col("__l"), col("__r"))
      .where(
        levenshtein(col(s"__l.$leftKey"), col(s"__r.$rightKey")) <= 1)
      .distinct()
      .select(col("__l.*") +: right.columns.map(c => col(s"__r.$c")): _*)
  }
}
