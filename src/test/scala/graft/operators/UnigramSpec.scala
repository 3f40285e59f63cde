package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Hard-EM unigram tokenizer: hand-traced Viterbi, segmentation
  * optimality under the fitted model, coverage (every word
  * segmentable), frequent-substring capture, tie determinism, and
  * partitioning invariance. */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  // "abab" dominates: the model should learn multi-char pieces
  // covering it better than characters.
  private lazy val docs = Seq(
    (1L, "abab abab abab cd"),
    (2L, "abab abab cd cd"),
    (3L, "ababx cd abab")
  ).toDF("doc_id", "text")

  test("viterbi picks the max-score segmentation (hand model)") {
    val words = Seq(("abc", 1L)).toDF("word", "freq")
    // lp("abc") would win outright; without it, "ab|c" (-1-5) beats
    // "a|bc" (-3-4=-7) and "a|b|c" (-3-6-5=-14).
    val vocab = Seq(
      ("a", -3L), ("b", -6L), ("c", -5L), ("ab", -1L), ("bc", -4L)
    ).toDF("piece", "lp_q")
    val out = Unigram.viterbiSegment(words, vocab, maxPieceLen = 4)
      .select($"seg", $"score_q").as[(String, Long)].head()
    assert(out == (("ab|c", -6L)))
  }

  test("viterbi tie breaks on lexicographic segmentation") {
    val words = Seq(("aa", 1L)).toDF("word", "freq")
    // "aa" (-4) ties "a|a" (-2-2): min-lex joined string wins; 'a'
    // sorts before 'a|a'... "aa" vs "a|a": 'a'='a', then 'a'(97) vs
    // '|'(124) -> "aa" < "a|a".
    val vocab = Seq(("a", -2L), ("aa", -4L)).toDF("piece", "lp_q")
    val out = Unigram.viterbiSegment(words, vocab, maxPieceLen = 4)
      .select($"seg").as[String].head()
    assert(out == "aa")
  }

  test("fitted model captures the dominant substring as a piece") {
    val vocab = Unigram.trainVocab(docs, "text", vocabSize = 8)
      .as[(String, Long, Long)].collect()
    val pieces = vocab.map(_._1).toSet
    assert(pieces.contains("abab") || pieces.contains("ab"),
      s"no multi-char piece for the dominant substring in ${pieces.mkString(",")}")
    // single-char coverage always present
    assert(Set("a", "b", "c", "d", "x").subsetOf(pieces))
  }

  test("every word type segments and pieces concatenate back") {
    val segs = Unigram.typeSegments(docs, "text", vocabSize = 8)
      .as[(String, Long, String, Long, Long)].collect()
    val words = Bpe.wordTypes(docs, "text").as[(String, Long)].collect()
    assert(segs.length == words.length)
    segs.foreach { case (word, _, seg, nPieces, _) =>
      assert(seg.split('|').mkString == word, s"$word -> $seg")
      assert(seg.split('|').length.toLong == nPieces)
    }
  }

  test("segmentation optimality: no enumerated path beats the DP") {
    val st = Unigram.trainState(docs, "text", vocabSize = 8)
    val lp = st.vocab.select($"piece", $"lp_q")
      .as[(String, Long)].collect().toMap
    val dp = Unigram.viterbiSegment(st.words, st.vocab, maxPieceLen = 4)
      .select($"word", $"score_q").as[(String, Long)].collect().toMap
    def paths(w: String): Seq[Seq[String]] =
      if (w.isEmpty) Seq(Seq.empty)
      else (1 to math.min(4, w.length)).flatMap { l =>
        val p = w.take(l)
        if (lp.contains(p)) paths(w.drop(l)).map(p +: _) else Seq.empty
      }
    dp.foreach { case (w, s) =>
      val best = paths(w).map(_.map(lp).sum).max
      assert(s == best, s"$w: dp $s vs enumerated $best")
    }
  }

  test("partitioning invariance") {
    val a = Unigram.trainVocab(docs, "text", vocabSize = 8)
      .as[(String, Long, Long)].collect().toSet
    val b = Unigram.trainVocab(docs.repartition(7), "text", vocabSize = 8)
      .as[(String, Long, Long)].collect().toSet
    assert(a == b)
  }

  test("resumable: chained 2+2 through a parquet round-trip == one-shot 4") {
    def vocabSet(s: Unigram.UnigramState) =
      s.vocab.select($"piece", $"cnt", $"lp_q")
        .as[(String, Long, Long)].collect().toSet
    val base = Unigram.trainState(docs, "text", vocabSize = 8)
    val oneShot = Unigram.resumeEm(base, 4)
    // chain: 2 rounds → persist → reload → 2 more
    val half = Unigram.resumeEm(base, 2)
    val dir = java.nio.file.Files.createTempDirectory("unigram-state").toString
    Unigram.saveState(half, dir)
    val resumed = Unigram.resumeEm(Unigram.loadState(spark, dir), 2)
    assert(vocabSet(resumed) == vocabSet(oneShot))
    // and the reloaded model segments identically
    val segA = Unigram.viterbiSegment(oneShot.words, oneShot.vocab, 4)
      .select($"word", $"seg").as[(String, String)].collect().toSet
    val segB = Unigram.viterbiSegment(resumed.words, resumed.vocab, 4)
      .select($"word", $"seg").as[(String, String)].collect().toSet
    assert(segA == segB)
  }

  test("resumeEm(0) is the identity on the fitted vocab") {
    val base = Unigram.trainState(docs, "text", vocabSize = 8)
    val same = Unigram.resumeEm(base, 0)
    assert(same.vocab.as[(String, Long, Long)].collect().toSet ==
      base.vocab.as[(String, Long, Long)].collect().toSet)
  }
}
