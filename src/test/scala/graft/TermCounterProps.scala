package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.TermCounter

/** ScalaCheck properties for the fused BM25 term-counting kernel
  * against a straightforward Scala reference of the tokenization
  * contract: lowercase, split on every single space (empty tokens
  * count), exact token equality.
  */
object TermCounterProps extends Properties("TermCounter.counts") {

  private def reference(text: String, terms: Seq[String]): Seq[Long] = {
    val toks = text.toLowerCase.split(" ", -1).toSeq
    terms.map(t => toks.count(_ == t.toLowerCase).toLong) :+ toks.size.toLong
  }

  private def run(text: String, terms: Seq[String]): Seq[Long] = {
    val arr = TermCounter.counts(
      UTF8String.fromString(text), TermCounter.termBytes(terms))
    (0 until arr.numElements()).map(arr.getLong)
  }

  private val token: Gen[String] =
    Gen.oneOf(Gen.alphaNumStr.map(_.take(8)), Gen.oneOf("hash", "join", "the", ""))

  private val texts: Gen[String] = Gen.oneOf(
    Gen.listOf(token).map(_.mkString(" ")),
    Gen.asciiPrintableStr,
    Gen.listOf(Gen.oneOf(token, Gen.const(" "), Gen.const("  "))).map(_.mkString(" ")),
    Gen.const(""))

  private val termSets: Gen[List[String]] =
    Gen.nonEmptyListOf(Gen.oneOf("hash", "join", "the", "a", "HASH")).map(_.distinct)

  property("matches the reference tokenizer") =
    Prop.forAll(texts, termSets) { (t, ts) => run(t, ts) == reference(t, ts) }

  property("token count = spaces + 1") = Prop.forAll(texts) { t =>
    run(t, Seq("x")).last == t.count(_ == ' ').toLong + 1L
  }

  property("unicode text does not miscount ascii terms") =
    Prop.forAll(Gen.listOf(Gen.oneOf("héllo", "中文", "hash", "🙂")).map(_.mkString(" "))) { t =>
      val r = run(t, Seq("hash"))
      r.head == t.split(" ", -1).count(_ == "hash").toLong
    }
}
