package graft

import graft.operators.TriangleCount
import org.apache.spark.sql.DataFrame

/** TriangleCount: exact counts on hand-checkable graphs, orientation /
  * duplicate normalization, and the ENFORCED degree cap — a hub vertex
  * past maxDegree must fail loudly (verdict-12 #5: the adjacency-array
  * shape is bounded only if the edge set's degrees are; on a foreign
  * edge set that assumption must be an error, not a silent task-buffer
  * blowup). */
class TriangleCountSpec extends SparkSpec {
  import spark.implicits._

  private def edges(pairs: (Long, Long)*): DataFrame =
    pairs.toDF("doc_a", "doc_b")

  test("triangle + wedge counts on a hand-checked graph") {
    // 1-2, 2-3, 1-3 (one triangle), 3-4 tail
    val e = edges((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    // wedges: middle 2 -> lo{1} x up{3} = 1; middle 3 -> lo{1,2} x up{4} = 2
    assert(TriangleCount.counts(e, "doc_a", "doc_b", 100) === ((4L, 3L, 1L)))
  }

  test("orientation and duplicates are normalized away") {
    val e = edges((2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (4L, 3L))
    assert(TriangleCount.counts(e, "doc_a", "doc_b", 100) === ((4L, 3L, 1L)))
  }

  test("empty edge set counts (0, 0, 0)") {
    assert(TriangleCount.counts(
      edges().limit(0), "doc_a", "doc_b", 10) === ((0L, 0L, 0L)))
  }

  test("a vertex exactly AT the degree cap passes") {
    val star = edges((1L to 10L).map(i => (0L, i)): _*)
    assert(TriangleCount.counts(star, "doc_a", "doc_b", 10) === ((10L, 0L, 0L)))
  }

  test("a hub vertex past the degree cap fails loudly, naming the bound") {
    val star = edges((1L to 10L).map(i => (0L, i)): _*)
    val e = intercept[Exception] {
      TriangleCount.counts(star, "doc_a", "doc_b", 5)
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("maxDegree = 5")),
      s"expected the degree-cap message, got: ${messages(e).mkString(" | ")}")
  }

  private def messagesOf(t: Throwable): Seq[String] =
    if (t == null) Nil else Option(t.getMessage).toSeq ++ messagesOf(t.getCause)

  test("countsNormalized matches counts on an already-canonical edge set") {
    val e = edges((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    assert(TriangleCount.countsNormalized(e, "doc_a", "doc_b", 100) ===
      TriangleCount.counts(e, "doc_a", "doc_b", 100))
  }

  test("countsNormalized rejects a reversed edge, naming the contract") {
    val e = intercept[Exception] {
      TriangleCount.countsNormalized(
        edges((2L, 1L), (2L, 3L)), "doc_a", "doc_b", 100)
    }
    assert(messagesOf(e).exists(_.contains("src < dst")),
      s"expected the orientation message, got: ${messagesOf(e).mkString(" | ")}")
  }

  test("countsNormalized rejects a duplicate edge") {
    val e = intercept[Exception] {
      TriangleCount.countsNormalized(
        edges((1L, 2L), (1L, 2L), (1L, 3L)), "doc_a", "doc_b", 100)
    }
    assert(messagesOf(e).exists(_.contains("duplicate edge")),
      s"expected the duplicate message, got: ${messagesOf(e).mkString(" | ")}")
  }
}
