package graft.functions

import org.scalacheck.{Gen, Prop, Properties}
import org.apache.spark.unsafe.types.UTF8String

/** ScalaCheck properties for the portable hash kernels (sbt runs Properties
  * suites natively — no scalatest bridge needed in the offline cache).
  */
object HashProperties extends Properties("graft.hash") {

  private def naive(s: String): Long = {
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * 31L + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    acc
  }

  property("polyHash matches the reference fold") =
    Prop.forAll(Gen.asciiPrintableStr) { s =>
      PolyHash.hash(UTF8String.fromString(s)) == naive(s)
    }

  property("polyHash range is [0, 1e9+7)") =
    Prop.forAll(Gen.asciiPrintableStr) { s =>
      val h = PolyHash.hash(UTF8String.fromString(s))
      h >= 0L && h < 1000000007L
    }

  property("polyHash is deterministic") =
    Prop.forAll(Gen.asciiPrintableStr) { s =>
      PolyHash.hash(UTF8String.fromString(s)) ==
        PolyHash.hash(UTF8String.fromString(s))
    }

  property("shingleHash of a short doc is the polyHash of the whole text") =
    Prop.forAll(Gen.identifier) { w =>
      // a single token is shorter than n=3 → one whole-text shingle
      val hashes = ShingleHash.hashes(UTF8String.fromString(w), 3)
      hashes.numElements() == 1 &&
        hashes.getLong(0) == PolyHash.hash(UTF8String.fromString(w.toLowerCase))
    }

  property("shingleHash emits tokens-n+1 shingles for long docs") =
    Prop.forAll(Gen.chooseNum(3, 40), Gen.identifier) { (n, w) =>
      val text = Seq.fill(n)(w).mkString(" ")
      ShingleHash.hashes(UTF8String.fromString(text), 3).numElements() == n - 2
    }
}
