package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.forAll
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{LexiconPolarity, Porter, Vader}
import graft.operators.DedupApprox

/** Property tests (SURVEY.md §5 item 3) over the pure-Scala kernels —
  * these run without a SparkSession, so they're cheap enough to crank
  * the sample count. DataFrame-level properties (anti-join ⊆ probe,
  * dedup uniqueness) live in the operator specs. */
class PropertySpec extends AnyFunSuite {

  /** scalacheck runner (no scalatestplus bridge in the offline cache). */
  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private val anyText: Gen[String] = Gen.asciiPrintableStr
  private val words: Gen[String] =
    Gen.listOf(Gen.oneOf(Gen.alphaLowerStr, Gen.oneOf(
      "good", "bad", "not", "very", "but", "never", "least", "!!!", "GREAT")))
      .map(_.mkString(" "))

  test("vader compound always in [-1, 1]") {
    check(forAll(words) { t => val c = Vader.compound(t); c >= -1.0 && c <= 1.0 })
    check(forAll(anyText) { t => val c = Vader.compound(t); c >= -1.0 && c <= 1.0 })
  }

  test("vader component scores are a distribution") {
    check(forAll(words) { t =>
      val s = Vader.polarityScores(t)
      s.neg >= 0 && s.neu >= 0 && s.pos >= 0 &&
        (s.neg + s.neu + s.pos == 0.0 || math.abs(s.neg + s.neu + s.pos - 1.0) < 0.01)
    })
  }

  test("lexicon polarity in [-1, 1] and 0 on unknown text") {
    check(forAll(words) { t =>
      val p = LexiconPolarity.polarity(t); p >= -1.0 && p <= 1.0 })
    check(forAll(Gen.numStr) { t => LexiconPolarity.polarity(t) == 0.0 })
  }

  test("porter stem never grows a word and is ascii-stable") {
    check(forAll(Gen.alphaLowerStr.suchThat(_.length > 2)) { w =>
      val s = Porter.stem(w)
      s.length <= w.length && s.nonEmpty
    })
  }

  test("shingles: every shingle has <= n tokens; count <= token count") {
    val texts = Gen.listOfN(30, Gen.alphaLowerStr.suchThat(_.nonEmpty)).map(_.mkString(" "))
    check(forAll(texts) { t =>
      val sh = DedupApprox.shinglesOf(t, 3)
      val toks = DedupApprox.tokensOf(t)
      sh.forall(_.split(" ").length <= 3) && sh.length <= math.max(1, toks.length)
    })
  }

  test("simhash: identical text => identical signature; deterministic") {
    check(forAll(anyText) { t =>
      DedupApprox.simhashOf(t) == DedupApprox.simhashOf(t) })
  }

  test("classifier trichotomy partitions [-1,1]") {
    check(forAll(Gen.chooseNum(-1.0, 1.0)) { s =>
      val label =
        if (s >= 0.1) "positive" else if (s <= -0.1) "negative" else "neutral"
      Seq("positive", "negative", "neutral").count(_ == label) == 1
    })
  }

  private val vec: Gen[Seq[Double]] =
    Gen.nonEmptyListOf(Gen.chooseNum(-10.0, 10.0)).map(_.toSeq)

  test("int8 quant: scale = max|v|/127, per-element error <= scale/2, checksum bounded") {
    import graft.operators.Similarity
    check(forAll(vec) { v =>
      val (scale, err, qsum) = Similarity.quantOf(v)
      val amax = v.map(math.abs).max
      val scaleOk = scale == amax / 127.0
      // round-half-up keeps every element within half a step, so the
      // L2 error is bounded by sqrt(n)·scale/2 (+ float slack)
      val errOk = err <= math.sqrt(v.length) * (scale / 2.0) + 1e-9
      val qsumOk = math.abs(qsum) <= 127L * v.length * (v.length + 1) / 2
      scaleOk && errOk && qsumOk
    })
  }

  test("ivf: assignment equals the top-1 probe; probes are distinct known ids") {
    import graft.operators.Similarity
    val cents: Gen[Seq[(Long, Seq[Double])]] =
      Gen.nonEmptyListOf(Gen.chooseNum(0L, 50L))
        .map(_.distinct.map(id => (id, Seq.tabulate(4)(d => ((id + d) % 7).toDouble - 3.0))))
        .suchThat(_.nonEmpty)
    val v4: Gen[Seq[Double]] = Gen.listOfN(4, Gen.chooseNum(-5.0, 5.0)).map(_.toSeq)
    check(forAll(v4, cents) { (v, cs) =>
      val assigned = Similarity.ivfAssignOf(v, cs)
      val probes = Similarity.ivfProbeOf(v, cs, 3)
      assigned == probes.head &&
        probes.distinct.length == probes.length &&
        probes.toSet.subsetOf(cs.map(_._1).toSet)
    })
  }

  test("media parsers never throw on arbitrary bytes (the untrusted-crawl contract)") {
    import graft.operators.Multimodal
    val bytes: Gen[Array[Byte]] =
      Gen.chooseNum(0, 200).flatMap(n =>
        Gen.listOfN(n, Gen.chooseNum(-128, 127).map(_.toByte)).map(_.toArray))
    check(forAll(bytes) { b =>
      Multimodal.imageHeader(b); Multimodal.audioHeader(b)
      Multimodal.videoHeader(b); Multimodal.pcmStats(b)
      Multimodal.imageStats(b)
      true // reaching here = no throw, the property under test
    })
  }

  test("media parsers never throw on CORRUPTED real files (bit flips + truncation)") {
    import graft.operators.Multimodal
    val real: Gen[Array[Byte]] = Gen.oneOf(
      Gen.chooseNum(0L, 500L).map(Multimodal.synthPng(_)),
      Gen.chooseNum(0L, 500L).map(Multimodal.synthWav(_)),
      Gen.chooseNum(0L, 500L).map(Multimodal.synthMp4(_)))
    val corrupted: Gen[Array[Byte]] = for {
      b <- real
      mode <- Gen.chooseNum(0, 2)
      pos <- Gen.chooseNum(0, math.max(0, b.length - 1))
      bit <- Gen.chooseNum(0, 7)
    } yield mode match {
      case 0 => val c = b.clone(); c(pos) = (c(pos) ^ (1 << bit)).toByte; c
      case 1 => java.util.Arrays.copyOf(b, pos) // truncate
      case _ => b.reverse                       // wholesale garbage
    }
    check(forAll(corrupted) { b =>
      Multimodal.imageHeader(b); Multimodal.audioHeader(b)
      Multimodal.videoHeader(b); Multimodal.pcmStats(b)
      Multimodal.imageStats(b)
      true
    })
  }
}
