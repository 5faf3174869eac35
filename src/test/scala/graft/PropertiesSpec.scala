package graft

import java.util.Base64

import graft.pipeline.AuditPipeline
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck-generated properties from SURVEY.md §5: pruned keys ⊆
  * allowlist, decode∘encode identity, chunking invariants. (Generators are
  * sampled manually — the scalatest↔scalacheck bridge isn't vendored.) */
class PropertiesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def samples[A](gen: Gen[A], n: Int = 100): Seq[A] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("chunking: every chunk <= max, order and multiplicity preserved") {
    val cases = samples(Gen.zip(Gen.listOf(Gen.alphaNumStr), Gen.chooseNum(1, 500)))
    assert(cases.nonEmpty)
    cases.foreach { case (xs, max) =>
      val chunks = xs.grouped(max).toList
      assert(chunks.forall(_.size <= max), s"chunk over $max")
      assert(chunks.flatten == xs, "order/multiplicity broken")
      if (xs.nonEmpty) assert(chunks.init.forall(_.size == max), "non-final short chunk")
    }
  }

  test("decode(encode(s)) is the identity for any payload") {
    samples(Gen.asciiPrintableStr).foreach { s =>
      val enc = Base64.getEncoder.encodeToString(s.getBytes("UTF-8"))
      assert(new String(Base64.getDecoder.decode(enc), "UTF-8") == s)
    }
  }

  test("shingle kernel invariants hold for arbitrary word sequences") {
    import org.apache.spark.unsafe.types.UTF8String
    val genText = Gen.listOf(Gen.oneOf("a", "b", "the", "fox", "", "xy"))
      .map(_.mkString(" "))
    samples(genText).foreach { text =>
      val nWords = text.split(" ", -1).length
      val ng = graft.functions.ShingleKernel.ngrams(UTF8String.fromString(text), 3)
      val sh = graft.functions.ShingleKernel.shingles(UTF8String.fromString(text), 3)
      assert(ng.numElements() == math.max(0, nWords - 2), s"ngram count for '$text'")
      val ngSeq = (0 until ng.numElements()).map(ng.getUTF8String(_).toString)
      val shSeq = (0 until sh.numElements()).map(sh.getUTF8String(_).toString)
      assert(shSeq == ngSeq.distinct, s"shingles must be first-occurrence-distinct ngrams for '$text'")
      // every ngram is reconstructible: n words joined by single spaces
      ngSeq.foreach(g => assert(g.split(" ", -1).length >= 3, s"bad gram '$g'"))
    }
  }

  test("pruned columns are always a subset of the allowlist") {
    import spark.implicits._
    val allCols = AuditPipeline.auditSchema.fieldNames.toSeq :+ "@timestamp"
    samples(Gen.someOf(allCols), n = 25).filter(_.nonEmpty).foreach { kept =>
      val df = Seq(1).toDF("__seed")
      val withCols = kept.foldLeft(df) { (d, c) =>
        d.withColumn(c, org.apache.spark.sql.functions.lit("x"))
      }.drop("__seed")
      val pruned = AuditPipeline.filterForEs(withCols)
      assert(pruned.columns.toSet.subsetOf(AuditPipeline.EsAllowedFields.toSet))
      assert(pruned.columns.toSet ==
        kept.toSet.intersect(AuditPipeline.EsAllowedFields.toSet))
    }
  }

  test("pq_nearest_code matches a reference argmin on arbitrary codebooks") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val dim = 4
    val genVec = Gen.listOfN(dim, Gen.chooseNum(-10000L, 10000L)).map(_.toArray)
    val genCase = for {
      k <- Gen.chooseNum(1, 16)
      cb <- Gen.listOfN(k, genVec)
      x <- genVec
    } yield (cb.toArray, x)
    samples(genCase).foreach { case (codes, x) =>
      def d2(a: Array[Long], b: Array[Long]): Long =
        a.zip(b).map { case (u, v) => (u - v) * (u - v) }.sum
      val want = codes.zipWithIndex.minBy { case (c, i) => (d2(c, x), i) }._2
      val expr = graft.functions.NearestCode(
        org.apache.spark.sql.catalyst.expressions.Literal(0),
        org.apache.spark.sql.catalyst.expressions.Literal(
          new GenericArrayData(x),
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType, false)),
        Array(codes))
      assert(expr.eval(null) == want, s"codebook=${codes.map(_.mkString(",")).mkString(";")} x=${x.mkString(",")}")
    }
  }

  test("nfc_normalize is idempotent and length-non-increasing on arbitrary unicode") {
    import org.apache.spark.unsafe.types.UTF8String
    // mix of ASCII, precomposed, decomposed, and combining-mark-heavy text
    val genStr = Gen.listOf(Gen.oneOf(
      "a", "á", "á", "ȩ́", "漢", "ﬁ", " ", "é", "z̈"))
      .map(_.mkString)
    samples(genStr).foreach { s =>
      val once = graft.functions.UnicodeKernel.nfc(UTF8String.fromString(s))
      val twice = graft.functions.UnicodeKernel.nfc(once)
      assert(once == twice, s"not idempotent on ${s.codePoints().toArray.toSeq}")
      assert(once.numChars() <= UTF8String.fromString(s).numChars(),
        "NFC must never add code points")
      assert(once.toString ==
        java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
    }
  }

  test("q120 closed-form chunk count tiles any document exactly") {
    // K = 1 for n <= W, else 1 + ceil((n - W) / S) — the q120 formula with
    // W = 64, S = 48, here checked against a direct tiling: starts advance
    // by S, every token is covered, only the last chunk may be short, and
    // the penultimate chunk never already covers the document (so K never
    // overcounts; a start can lie inside the doc yet still be redundant,
    // e.g. n = 160, so "next start past n" is NOT the invariant).
    // chooseNum rarely hits interior boundaries, so the branch-switch and
    // exact-tiling lengths around W and W+S are pinned explicitly.
    val (w, st) = (64, 48)
    val boundary = Seq(1, 63, 64, 65, 66, 111, 112, 113, 114, 160)
    (boundary ++ samples(Gen.chooseNum(1, 5000))).foreach { n =>
      val k = if (n <= w) 1L else (n - 17).toLong / st + 1
      val starts = (0L until k).map(_ * st)
      assert(starts.head == 0 && starts.last < n, s"n=$n: start range")
      assert(starts.last + w >= n, s"n=$n: tail uncovered")
      if (k > 1) assert(starts(k.toInt - 2) + w < n,
        s"n=$n: penultimate chunk already covers the doc — K overcounts")
      val lens = starts.map(s0 => math.min(w.toLong, n - s0))
      assert(lens.init.forall(_ == w) && lens.last >= 1, s"n=$n: chunk lengths")
    }
  }
}
