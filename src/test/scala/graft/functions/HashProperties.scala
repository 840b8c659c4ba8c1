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

  // Misra-Gries: any item with count > N/(capacity+1) survives the sketch,
  // whether the stream is reduced sequentially or split and merged.
  private val mgStream: Gen[List[String]] = for {
    heavy <- Gen.chooseNum(30, 60)
    noise <- Gen.listOfN(40, Gen.oneOf("a", "b", "c", "d", "e", "f", "g", "h"))
  } yield scala.util.Random.shuffle(List.fill(heavy)("HH") ++ noise)

  property("misra-gries retains every heavy hitter, sequential or merged") =
    Prop.forAll(mgStream, Gen.chooseNum(1, 39)) { (stream, split) =>
      val mg = new HeavyHitters(4) // N ≤ 100 ⇒ floor N/5 ≤ 20 < 30 ≤ count(HH)
      val seq = stream.foldLeft(mg.zero)(mg.reduce)
      val (l, r) = stream.splitAt(split)
      val merged = mg.merge(l.foldLeft(mg.zero)(mg.reduce),
        r.foldLeft(mg.zero)(mg.reduce))
      seq.contains("HH") && merged.contains("HH") &&
        seq.size <= 4 && merged.size <= 4
    }

  // CDC invariants: chunks tile the input exactly (no gap, no overlap)
  // and every chunk's hash field IS the polyHash of its substring — the
  // property that makes chunk keys comparable across engines and across
  // re-chunkings of edited documents.
  property("contentChunks tile the text; every chunk hash is the polyHash " +
      "of its substring") =
    Prop.forAll(Gen.asciiPrintableStr) { s =>
      val arr = ContentChunks.chunks(UTF8String.fromString(s), 8, 32)
      val packed = (0 until arr.numElements()).map(arr.getLong)
      val lens = packed.map(p => (p % 1048576L).toInt)
      val tiles = lens.sum == s.codePoints().toArray.length
      var st = 0
      val hashesMatch = packed.forall { p =>
        val len = (p % 1048576L).toInt
        val sub = s.substring(st, st + len) // ascii ⇒ cp index = char index
        st += len
        p / 1048576L == naive(sub)
      }
      tiles && hashesMatch && packed.nonEmpty
    }

  private val unicodeStr: Gen[String] =
      Gen.listOf(Gen.oneOf('a', 'Z', ' ', '\u00e9', '\u0301', 'e', '\u00df', '\u4e2d', '\u00a0'))
      .map(_.mkString)

  property("nfcNormalize is idempotent; ASCII is a same-reference fixed point") =
    Prop.forAll(Gen.asciiPrintableStr, unicodeStr) { (ascii, uni) =>
      val a = UTF8String.fromString(ascii)
      val u = UTF8String.fromString(uni)
      val once = NfcNormalize.normalize(u)
      (NfcNormalize.normalize(a) eq a) &&
        NfcNormalize.normalize(once) == once
    }
}
