package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Prefix-filter set-similarity join: completeness vs brute force
  * (the property x11's df-capped index cannot give), canonical
  * rarity ordering, and integer-exact threshold edges. */
class SetJoinSpec extends SparkSpec {
  import spark.implicits._

  // small corpus with planted overlaps of graded strength; shingleN=1
  // makes the sets just the distinct-token sets, easy to reason about
  private val docs = Seq(
    (1L, "a b c d e f g h i j"),
    (2L, "a b c d e f g h i k"),   // 9/11 with 1
    (3L, "a b c d e f g h x y"),   // 8/12 with 1
    (4L, "p q r s t u v w"),
    (5L, "p q r s t u v w"),       // exact dup of 4
    (6L, "z z z z"),               // single-token set
    (7L, "")                       // empty → dropped
  ).toDF("doc_id", "text")

  private def brute(num: Int, den: Int): Set[(Long, Long)] = {
    val sets = docs.collect().map(r => (r.getLong(0),
        DedupApprox.shinglesOf(r.getString(1), 1).toSet))
      .filter(_._2.nonEmpty)
    (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
      inter = (sa & sb).size; uni = (sa | sb).size
      if inter.toLong * den >= uni.toLong * num
    } yield (ia, ib)).toSet
  }

  test("finds exactly the brute-force pairs at several thresholds") {
    for ((num, den) <- Seq((8, 10), (7, 10), (1, 2))) {
      val got = SetJoin.prefixJaccardPairs(docs, "doc_id", "text",
          shingleN = 1, num = num, den = den)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(got == brute(num, den), s"threshold $num/$den")
    }
  }

  test("exact duplicates surface with jac_micro = 1000000") {
    val r = SetJoin.prefixJaccardPairs(docs, "doc_id", "text",
        shingleN = 1, num = 9, den = 10)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(r == Set((4L, 5L, 8L, 8L, 1000000L)))
  }

  test("threshold edge is integer-exact: 9/11 passes at num/den = 9/11") {
    val got = SetJoin.prefixJaccardPairs(docs, "doc_id", "text",
        shingleN = 1, num = 9, den = 11)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got.contains((1L, 2L)))      // exactly 9/11
    assert(!got.contains((1L, 3L)))     // 8/12 < 9/11
  }

  test("randomized corpora: prefix join == brute force (3 seeds)") {
    val vocab = Vector("ant", "bee", "cat", "dog", "elk", "fox",
      "gnu", "hen", "ibis", "jay", "kit", "lark")
    for (seed <- Seq(7, 41, 97)) {
      val rnd = new scala.util.Random(seed)
      val corpus = (1 to 40).map { i =>
        val n = 3 + rnd.nextInt(13)
        (i.toLong, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val df = corpus.toDF("doc_id", "text")
      val sets = corpus.map { case (id, t) =>
        (id, DedupApprox.shinglesOf(t, 2).toSet) }.filter(_._2.nonEmpty)
      for ((num, den) <- Seq((1, 2), (7, 10))) {
        val want = (for {
          (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
          inter = (sa & sb).size; uni = (sa | sb).size
          if inter.toLong * den >= uni.toLong * num
        } yield (ia, ib)).toSet
        val got = SetJoin.prefixJaccardPairs(df, "doc_id", "text",
            shingleN = 2, num = num, den = den)
          .select("id_a", "id_b").as[(Long, Long)].collect().toSet
        assert(got == want, s"seed $seed threshold $num/$den")
      }
    }
  }

  test("canonical order puts rarest shingles first") {
    // 'k' appears in one doc, 'a' in three — doc 2's set must open
    // with its rare tokens, so the prefix join keys stay low-df
    val toks = SetJoin.canonicalSets(docs, "doc_id", "text", 1)
      .filter($"id" === 2L).select("toks").as[Seq[String]].head()
    val dfOf = Map("k" -> 1, "i" -> 2) // rarest two in doc 2
    assert(toks.take(2).forall(dfOf.contains))
    assert(toks.last.head >= 'a' && toks.size == 10)
  }
}
