package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Interpolated trigram LM with tri→bigram→unigram→floor backoff. */
class TrigramLmSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (0L, "a b c a b c"),   // trains trigrams (a b c), (b c a), (c a b)
    (2L, "a b d")          // trains (a b d)
  ).toDF("doc_id", "text")

  test("self-train: every trigram hits the top level") {
    val r = LmScore.trigramScore(corpus, "doc_id", "text")
      .select($"doc_id", $"n_trigrams", $"n_tri_hit", $"n_oov")
      .as[(Long, Long, Long, Long)].collect().toMap2
    assert(r(0L) == ((4L, 4L, 0L)))
    assert(r(2L) == ((1L, 1L, 0L)))
  }

  test("holdout: backoff chain levels fire as designed") {
    val model = LmScore.trainTrigram(corpus, "doc_id", "text")
    val held = Seq(
      (1L, "a b c"),    // seen trigram -> tri hit
      (3L, "c b c"),    // (c b c) unseen; (b c) seen -> bigram backoff
      (5L, "x a b"),    // (x a b) unseen, (a b) seen -> bigram backoff
      (7L, "b b a"),    // (b b a) & (b a) unseen, unigram a seen -> ug
      (9L, "z z z"),    // nothing seen -> oov floor
      (11L, "a b")      // too short: zeros
    ).toDF("doc_id", "text")
    val r = LmScore.trigramScoreWith(held, "doc_id", "text", model)
      .select($"doc_id", $"n_tri_hit", $"n_bg_backoff", $"n_ug_backoff",
        $"n_oov")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4, t._5))).toMap
    assert(r(1L) == ((1L, 0L, 0L, 0L)))
    assert(r(3L) == ((0L, 1L, 0L, 0L)))
    assert(r(5L) == ((0L, 1L, 0L, 0L)))
    assert(r(7L) == ((0L, 0L, 1L, 0L)))
    assert(r(9L) == ((0L, 0L, 0L, 1L)))
    assert(r(11L) == ((0L, 0L, 0L, 0L)))
  }

  test("oov positions are charged the floor logprob") {
    val model = LmScore.trainTrigram(corpus, "doc_id", "text")
    val r = LmScore.trigramScoreWith(
      Seq((9L, "z z z")).toDF("doc_id", "text"), "doc_id", "text", model)
      .select($"lp_sum_q").as[Long].head()
    assert(r == LmScore.DefaultFloorLpQ)
  }

  test("interpolated score ranks typical text above junk") {
    val docs = Seq(
      (1L, "a b c a b c"),  // in-distribution
      (3L, "q w e r t y")   // out-of-distribution
    ).toDF("doc_id", "text")
    val model = LmScore.trainTrigram(corpus, "doc_id", "text")
    val r = LmScore.trigramScoreWith(docs, "doc_id", "text", model)
      .select($"doc_id", $"avg_lp_q").as[(Long, Double)].collect().toMap
    assert(r(1L) > r(3L))
  }

  test("deterministic under input partitioning") {
    val a = LmScore.trigramScore(corpus.repartition(7), "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    val b = LmScore.trigramScore(corpus.coalesce(1), "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  // ---- Kneser–Ney ------------------------------------------------------

  test("KN: backoff chain levels fire as designed (ARPA walk)") {
    val model = LmScore.trainTrigramKN(corpus, "doc_id", "text")
    val held = Seq(
      (1L, "a b c"),    // seen trigram -> tri hit
      (3L, "c b c"),    // (c b c) unseen; (b c) seen -> bigram backoff
      (7L, "b b a"),    // (b b a) & (b a) unseen, 'a' has left contexts -> ug
      (9L, "z z z"),    // nothing seen -> oov floor
      (11L, "a b")      // too short: zeros
    ).toDF("doc_id", "text")
    val r = LmScore.knScoreWith(held, "doc_id", "text", model)
      .select($"doc_id", $"n_tri_hit", $"n_bg_backoff", $"n_ug_backoff",
        $"n_oov")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4, t._5))).toMap
    assert(r(1L) == ((1L, 0L, 0L, 0L)))
    assert(r(3L) == ((0L, 1L, 0L, 0L)))
    assert(r(7L) == ((0L, 0L, 1L, 0L)))
    assert(r(9L) == ((0L, 0L, 0L, 1L)))
    assert(r(11L) == ((0L, 0L, 0L, 0L)))
  }

  test("KN: continuation counts, not raw frequency, drive the backoff level") {
    // the classic "Francisco" asymmetry: 'tok' is FREQUENT (8 raw
    // occurrences) but only ever follows 'san'; 'dog' is rarer (3)
    // but follows three different words. A JM unigram scores by raw
    // frequency and prefers 'tok'; KN's continuation unigram must
    // prefer 'dog' when both back off to the unigram level.
    val kn = Seq(
      (0L, "san tok p san tok q san tok r san tok"),
      (2L, "red dog s blue dog t green dog")
    ).toDF("doc_id", "text")
    val model = LmScore.trainTrigramKN(kn, "doc_id", "text")
    // (z q tok) and (z q dog): trigram+bigram unseen, both fall to
    // the continuation unigram with zero backoff weights
    val held = Seq((1L, "z q tok"), (3L, "z q dog")).toDF("doc_id", "text")
    val r = LmScore.knScoreWith(held, "doc_id", "text", model)
      .select($"doc_id", $"n_ug_backoff", $"lp_sum_q")
      .as[(Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(r(1L)._1 == 1L && r(3L)._1 == 1L) // both at the unigram level
    assert(r(3L)._2 > r(1L)._2,
      s"KN must score many-context 'dog' above one-context 'tok': $r")
  }

  test("KN: score ranks typical text above junk") {
    val docs = Seq(
      (1L, "a b c a b c"),  // in-distribution
      (3L, "q w e r t y")   // out-of-distribution
    ).toDF("doc_id", "text")
    val model = LmScore.trainTrigramKN(corpus, "doc_id", "text")
    val r = LmScore.knScoreWith(docs, "doc_id", "text", model)
      .select($"doc_id", $"avg_lp_q").as[(Long, Double)].collect().toMap
    assert(r(1L) > r(3L))
  }

  test("KN: seen probabilities per context sum below 1 (discount leaks mass)") {
    // sanity of the discounting arithmetic: Σ_w3 p(w3 | w1 w2) over
    // SEEN trigrams < 1, the mass the backoff weight redistributes
    val model = LmScore.trainTrigramKN(corpus, "doc_id", "text")
    val sums = model.tri
      .groupBy($"w1", $"w2")
      .agg(sum(exp($"lp_q".cast("double") / 1e6)).as("mass"))
      .select($"mass").as[Double].collect()
    assert(sums.nonEmpty && sums.forall(m => m < 1.0 + 1e-9))
  }

  test("KN: deterministic under input partitioning") {
    val score = (df: org.apache.spark.sql.DataFrame) =>
      LmScore.knScoreWith(corpus, "doc_id", "text",
        LmScore.trainTrigramKN(df, "doc_id", "text"))
        .orderBy("doc_id").collect().toSeq
    assert(score(corpus.repartition(7)) == score(corpus.coalesce(1)))
  }

  private implicit class Map2[A, B, C, D](rows: Array[(A, B, C, D)]) {
    def toMap2: Map[A, (B, C, D)] = rows.map(t => t._1 -> ((t._2, t._3, t._4))).toMap
  }
}
