package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Blocked fuzzy title matching: hand-built headline edits, the
  * blocking recall trade (rarest-token agreement), the dfCap guard,
  * symmetry/threshold contracts, and partitioning invariance. */
class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  // Headline pairs: (1,2) one-word edit ("rally" -> "slump") whose
  // replaced words BOTH also occur in doc 5, so the pair's rarest
  // (df, token) stays the shared "quantum" and they block together;
  // (3,4) identical titles; 5 is unrelated (unique rarest token ->
  // singleton block); 6/7 differ in their one rare word each
  // ("is"/"was"), so they land in different blocks and match nothing.
  private lazy val docs = Seq(
    (1L, "quantum markets rally today again cup"),
    (2L, "quantum markets slump today again cup"),
    (3L, "local team wins cup final again"),
    (4L, "local team wins cup final again and again"),
    (5L, "different rally slump markets today patterns"),
    (6L, "the a of to in is"),
    (7L, "the a of to in was")
  ).toDF("doc_id", "text")

  test("edited headline pair is found with its distance") {
    val out = FuzzyJoin.fuzzyTitlePairs(docs, "doc_id", "text")
      .as[(Long, Long, String, Long)].collect().toSeq
    val m = out.map(r => (r._1, r._2) -> r._4).toMap
    // "rally" -> "slump": levenshtein 5 on the joined titles.
    assert(m((1L, 2L)) == 5L)
    // identical first-6-token titles.
    assert(m((3L, 4L)) == 0L)
  }

  test("unrelated titles never pair; matches stay within maxDist") {
    val out = FuzzyJoin.fuzzyTitlePairs(docs, "doc_id", "text")
      .as[(Long, Long, String, Long)].collect().toSeq
    assert(!out.exists(r => r._1 == 5L || r._2 == 5L))
    assert(out.forall(_._4 <= 8L))
    assert(out.forall(r => r._1 < r._2))
  }

  test("blocking recall trade: pair missed when the rarest token itself is edited") {
    val d2 = Seq(
      (1L, "zephyr wind conditions mild across region"),
      (2L, "zephyrs wind conditions mild across region")
    ).toDF("doc_id", "text")
    // Rarest tokens differ ("zephyr" df=1 vs "zephyrs" df=1) -> no
    // shared block -> no pair, even though dist would be 1. This is
    // the documented Christen blocking bet, asserted not hidden.
    val out = FuzzyJoin.fuzzyTitlePairs(d2, "doc_id", "text")
    assert(out.count() == 0L)
  }

  test("second blocking key recovers the edited-rarest-token pair") {
    // The planted edit changes each doc's RAREST token ("zephyr" vs
    // "zephyrs", both df=1), so single-key blocking misses the pair
    // (test above). Their SECOND-rarest token is the shared "wind"
    // (df=2, rarer than the df=3 tail words) — the 2-key pass blocks
    // them together and finds the dist-1 pair. Christen ch.4's
    // multi-pass recall argument, spec'd both ways.
    val d2 = Seq(
      (1L, "zephyr wind conditions mild across region"),
      (2L, "zephyrs wind conditions mild across region"),
      (3L, "other conditions mild across region words")
    ).toDF("doc_id", "text")
    assert(FuzzyJoin.fuzzyTitlePairs(d2, "doc_id", "text").count() == 0L)
    val two = FuzzyJoin.fuzzyTitlePairs(d2, "doc_id", "text", blockKeys = 2)
      .as[(Long, Long, String, Long)].collect().toSeq
    assert(two.map(r => (r._1, r._2, r._4)) == Seq((1L, 2L, 1L)))
    assert(two.head._3 == "wind")
  }

  test("multi-key pair dedup: one row per pair, smallest agreeing key") {
    // Identical titles share BOTH blocking keys — the pair must still
    // surface exactly once, reporting the smaller key.
    val d = Seq(
      (1L, "unique1 shared alpha beta gamma delta"),
      (2L, "unique1 shared alpha beta gamma delta")
    ).toDF("doc_id", "text")
    val out = FuzzyJoin.fuzzyTitlePairs(d, "doc_id", "text", blockKeys = 2)
      .as[(Long, Long, String, Long)].collect().toSeq
    assert(out.length == 1)
    assert(out.head._4 == 0L)
  }

  test("two-key candidate set is a superset of single-key, on real data") {
    val dir = "/root/testdata/sf0.001"
    val d = graft.sources.Tables.documents(spark, dir)
    def pairs(k: Int) =
      FuzzyJoin.fuzzyTitlePairs(d, "doc_id", "text", blockKeys = k)
        .select($"id_a", $"id_b", $"dist")
        .as[(Long, Long, Long)].collect().toSet
    val one = pairs(1)
    val two = pairs(2)
    assert(one.nonEmpty)
    // multi-pass blocking only ADDS candidates; verdicts are identical
    // per pair, so the single-key result embeds in the two-key result
    assert(one.subsetOf(two), s"missing: ${one.diff(two).take(5)}")
  }

  test("dfCap excludes docs whose rarest token is common") {
    // With dfCap=1 every token shared by both docs is over the cap.
    val out = FuzzyJoin.fuzzyTitlePairs(docs, "doc_id", "text", dfCap = 1L)
    assert(out.count() == 0L)
  }

  test("maxBlock drops oversized blocks whole") {
    // Three identical titles share one block (size 3); a distinct
    // pair sits in its own block of 2. maxBlock=2 drops the triple
    // entirely, keeps the pair; the default keeps all four pairs.
    val t = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta"),
      (3L, "alpha beta gamma delta"),
      (4L, "wholly other headline text"),
      (5L, "wholly other headline text")
    ).toDF("doc_id", "text")
    val all = FuzzyJoin.fuzzyTitlePairs(t, "doc_id", "text")
      .as[(Long, Long, String, Long)].collect()
    assert(all.map(r => (r._1, r._2)).toSet ==
      Set((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L)))
    val capped = FuzzyJoin.fuzzyTitlePairs(t, "doc_id", "text", maxBlock = 2L)
      .as[(Long, Long, String, Long)].collect()
    assert(capped.map(r => (r._1, r._2)).toSet == Set((4L, 5L)))
  }

  test("empty and null text drop out") {
    val d2 = Seq((1L, ""), (2L, null.asInstanceOf[String]), (3L, "real title here"))
      .toDF("doc_id", "text")
    assert(FuzzyJoin.fuzzyTitlePairs(d2, "doc_id", "text").count() == 0L)
  }

  test("partitioning invariance: same pairs at 1 and 13 partitions") {
    val base = FuzzyJoin.fuzzyTitlePairs(docs, "doc_id", "text")
      .as[(Long, Long, String, Long)].collect().toSet
    val re = FuzzyJoin.fuzzyTitlePairs(docs.repartition(13), "doc_id", "text")
      .as[(Long, Long, String, Long)].collect().toSet
    assert(base == re)
  }
}
