package graft

import org.scalacheck.{Gen, Prop, Properties}
import graft.functions.Embedder

/** ScalaCheck properties for the driver-local embedder form (pure
  * function of the text — property-testable without a Spark session).
  */
object EmbedderProps extends Properties("Embedder.embedLocal") {

  private val texts: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr,
    Gen.asciiPrintableStr,
    Gen.listOf(Gen.oneOf(Gen.alphaChar, Gen.const(' '))).map(_.mkString))

  property("deterministic") = Prop.forAll(texts) { t =>
    Embedder.embedLocal(t).sameElements(Embedder.embedLocal(t))
  }

  property("fixed dimensionality") = Prop.forAll(texts) { t =>
    Embedder.embedLocal(t).length == Embedder.Dim
  }

  property("values in [0,1)") = Prop.forAll(texts) { t =>
    Embedder.embedLocal(t).forall(v => v >= 0.0f && v < 1.0f)
  }

  property("dim-prefix stability") = Prop.forAll(texts, Gen.choose(1, 32)) {
    (t, d) =>
      Embedder.embedLocal(t, d).sameElements(Embedder.embedLocal(t).take(d))
  }
}
