package graft

import org.apache.spark.sql.functions._

import graft.operators.FuzzyJoin

/** The deletion-neighborhood blocking theorem: ED ≤ 1 pairs ALWAYS
  * share a {s} ∪ del1(s) variant, so the equi-join candidates are
  * complete and the levenshtein verify makes the result exactly the
  * brute-force cross join's. Random corpora over a small alphabet force
  * plenty of near-miss pairs. */
class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private def randomKeys(seed: Int, n: Int, lenMax: Int): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n)(
      (0 until (1 + rnd.nextInt(lenMax))).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString)
  }

  test("ed1Join equals brute-force levenshtein <= 1 on random small-alphabet corpora") {
    for (seed <- Seq(1, 2, 3)) {
      val left = randomKeys(seed, 60, 6).zipWithIndex
        .map { case (k, i) => (i.toLong, k) }.toDF("lid", "lkey")
      val right = randomKeys(seed + 100, 80, 6).zipWithIndex
        .map { case (k, i) => (i.toLong, k) }.toDF("rid", "rkey")
      val fast = FuzzyJoin.ed1Join(left, "lkey", right, "rkey")
        .select("lid", "rid").as[(Long, Long)].collect().sorted.toSeq
      val brute = left.crossJoin(right)
        .where(levenshtein(col("lkey"), col("rkey")) <= 1)
        .select("lid", "rid").as[(Long, Long)].collect().sorted.toSeq
      assert(brute.nonEmpty, s"seed $seed fixture has no ED<=1 pairs")
      assert(fast === brute, s"seed $seed")
    }
  }

  test("edge keys: empty-adjacent, single char, equal adjacent chars") {
    val left = Seq((1L, "a"), (2L, "aa"), (3L, "ab"), (4L, "xyz")).toDF("lid", "lkey")
    val right = Seq((10L, ""), (11L, "aa"), (12L, "b"), (13L, "xz")).toDF("rid", "rkey")
    val got = FuzzyJoin.ed1Join(left, "lkey", right, "rkey")
      .select("lid", "rid").as[(Long, Long)].collect().sorted.toSeq
    val brute = left.crossJoin(right)
      .where(levenshtein(col("lkey"), col("rkey")) <= 1)
      .select("lid", "rid").as[(Long, Long)].collect().sorted.toSeq
    assert(got === brute)
  }

  test("multibyte keys: variant generation agrees with levenshtein on non-ASCII text") {
    // substr-based deletion variants and levenshtein must agree on what
    // "one edit" means for multibyte code points (incl. surrogate pairs)
    val alphabet = Array("a", "ä", "中", "🙂")
    val rnd = new scala.util.Random(7)
    def key() = (0 until (1 + rnd.nextInt(4))).map(_ => alphabet(rnd.nextInt(4))).mkString
    val left = Seq.fill(40)(key()).zipWithIndex
      .map { case (k, i) => (i.toLong, k) }.toDF("lid", "lkey")
    val right = Seq.fill(40)(key()).zipWithIndex
      .map { case (k, i) => (i.toLong, k) }.toDF("rid", "rkey")
    val fast = FuzzyJoin.ed1Join(left, "lkey", right, "rkey")
      .select("lid", "rid").as[(Long, Long)].collect().sorted.toSeq
    val brute = left.crossJoin(right)
      .where(levenshtein(col("lkey"), col("rkey")) <= 1)
      .select("lid", "rid").as[(Long, Long)].collect().sorted.toSeq
    assert(brute.nonEmpty)
    assert(fast === brute)
  }

  test("the candidate stage plans an equi-join, not a nested loop") {
    val left = Seq((1L, "abc")).toDF("lid", "lkey")
    val right = Seq((2L, "abd")).toDF("rid", "rkey")
    val plan = FuzzyJoin.ed1Join(left, "lkey", right, "rkey")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
  }
}
