package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Q-2 fidelity: TF-IDF ranking behavior (elasticsearch_handler.py:71-80
  * ranks by relevance, not raw term count). */
class SearchSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "common common common common common"), // stuffed with the common term
    (2L, "rare topic"),                         // one hit on the rare term
    (3L, "common rare"),                        // one of each
    (4L, "nothing relevant here"),
    (5L, "common filler words"),
    (6L, "common words again"),
    (7L, "more common text")
  ).toDF("doc_id", "text")

  test("single rare-term hit outranks single common-term hit") {
    val r = Search.byKeywordRanked(docs, "doc_id", Seq("text"),
      Seq("common", "rare"), k = 10)
      .select("doc_id").as[Long].collect()
    // df(common)=5, df(rare)=2 of N=7: idf(rare)=ln(3.5) vs
    // idf(common)=ln(1.4), so doc 2's one rare hit beats every
    // single-common-hit doc (5,6,7) — byKeyword ties all four at 1
    val pos = r.zipWithIndex.toMap
    assert(pos(2L) < pos(5L) && pos(2L) < pos(6L) && pos(2L) < pos(7L))
    // both-terms doc ranks above single-common docs too
    assert(pos(3L) < pos(5L))
    assert(!r.contains(4L)) // zero score rows filtered
  }

  test("byKeyword (count-ranked) puts the stuffed doc first — the gap q50 closes") {
    val r = Search.byKeyword(docs, Seq("text"), Seq("common", "rare"),
      tiebreak = "doc_id", k = 10)
      .select("doc_id").as[Long].collect()
    assert(r.head == 1L)
  }

  test("unknown terms contribute zero, not NaN") {
    val r = Search.byKeywordRanked(docs, "doc_id", Seq("text"),
      Seq("zzz_absent", "rare"), k = 10)
      .select(col("doc_id"), col("score")).collect()
    assert(r.forall(row => !row.getDouble(1).isNaN))
    assert(r.map(_.getLong(0)).toSet == Set(2L, 3L))
  }

  test("null text scores 0, never null, in every scored frame") {
    // contract: the scored frames append score >= 0 to EVERY input
    // row; a null score would silently drop the row through score>0
    // filters instead of ranking it last
    val withNull = docs.union(Seq((8L, null: String)).toDF("doc_id", "text"))
    val kw = withNull.select(col("doc_id"),
      Search.keywordScore(Seq(col("text")), Seq("common")).as("score"))
      .where(col("doc_id") === 8L).collect()
    assert(!kw(0).isNullAt(1) && kw(0).getDouble(1) == 0.0)
    for (scored <- Seq(
        Search.tfidfScored(withNull, Seq("text"), Seq("common")),
        Search.bm25Scored(withNull, Seq("text"), Seq("common")))) {
      val row = scored.where(col("doc_id") === 8L).select("score").collect()
      assert(row.length == 1 && !row(0).isNullAt(0) && row(0).getDouble(0) == 0.0)
    }
  }

  test("rrfFuse: overlap sums legs, single-leg ids keep one term") {
    val lex = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("id", "rank")
    val vec = Seq((2L, 1L), (4L, 2L)).toDF("id", "rank")
    val got = Search.rrfFuse(lex, vec, "id", k0 = 60)
      .as[(Long, Double)].collect().toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L))
    assert(got(1L) == 1.0 / 61.0)
    assert(got(2L) == 1.0 / 62.0 + 1.0 / 61.0)
    assert(got(3L) == 1.0 / 63.0)
    assert(got(4L) == 1.0 / 62.0)
    // an id on both lists outranks either of its single-leg scores
    assert(got(2L) > got(1L) && got(2L) > got(4L))
  }

  test("percolate: conjunction matches only, repeated terms count once") {
    val docs = Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha alpha beta"),    // repeated term must not fake arity
      (3L, "beta gamma"),
      (4L, "delta")
    ).toDF("doc_id", "text")
    val stored = Seq((10L, Seq("alpha", "beta")), (20L, Seq("gamma")),
      (30L, Seq("alpha", "delta"))).toDF("query_id", "terms")
    val got = Search.percolate(docs, "doc_id", Seq("text"), stored)
      .select("doc_id", "query_id").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L), (2L, 10L), (1L, 20L), (3L, 20L)))
  }

  test("moreLikeThis ranks by shared rare terms, excludes the source") {
    val docs = Seq(
      (1L, "rare1 rare2 rare3 common"),
      (2L, "rare1 rare2 other common"),   // shares 2 rare
      (3L, "rare3 misc common"),          // shares 1 rare
      (4L, "common only")                 // shares none rare
    ).toDF("doc_id", "text")
    // common appears in all 4 docs; with maxDf=3 it is excluded
    val got = Search.moreLikeThis(docs, "doc_id", Seq("text"),
        sourceId = 1L, maxDf = 3L, k = 5)
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((2L, 2L), (3L, 1L)))
  }

  test("percolateBool: must_not vetoes a must match") {
    val docs = Seq((1L, "alpha beta"), (2L, "alpha beta bad"),
      (3L, "alpha")).toDF("doc_id", "text")
    val stored = Seq((10L, Seq("alpha", "beta"), Seq("bad")),
      (20L, Seq("alpha"), Seq[String]()))
      .toDF("query_id", "terms", "not_terms")
    val got = Search.percolateBool(docs, "doc_id", Seq("text"), stored)
      .select("doc_id", "query_id").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L), (1L, 20L), (2L, 20L), (3L, 20L)))
  }

  test("suggestFuzzy ranks by (distance, cf) and tolerates one edit") {
    val docs = Seq((1L, "scan scan scans span spark plan zebra"))
      .toDF("doc_id", "text")
    val got = Search.suggestFuzzy(docs, Seq("text"), "scann", 1, 5)
      .as[(String, Long, Long)].collect().toSeq
    // scan (del, cf 2), scans (sub, cf 1) — span/spark/plan are ≥ 2 edits
    assert(got == Seq(("scan", 2L, 1L), ("scans", 1L, 1L)))
  }

  test("moreLikeThis: randomized corpora match brute force (3 seeds)") {
    val vocab = (0 until 30).map(i => s"w$i")
    for (seed <- Seq(43, 83, 139)) {
      val rnd = new scala.util.Random(seed)
      val corpus = (1 to 40).map(i =>
        (i.toLong, Seq.fill(3 + rnd.nextInt(10))(
          vocab(rnd.nextInt(vocab.size))).mkString(" ")))
      val sets = corpus.map { case (id, t) => id -> t.split(" ").toSet }.toMap
      val dfOf = vocab.map(w => w -> sets.values.count(_(w)).toLong).toMap
      val maxDf = 8L
      val sel = sets(1L).filter(w => dfOf(w) <= maxDf)
      val want = sets.toSeq.filter(_._1 != 1L)
        .map { case (id, ts) => (id, (ts & sel).size.toLong) }
        .filter(_._2 > 0L)
        .sortBy { case (id, n) => (-n, id) }.take(10)
      val got = Search.moreLikeThis(corpus.toDF("doc_id", "text"),
          "doc_id", Seq("text"), sourceId = 1L, maxDf = maxDf, k = 10)
        .as[(Long, Long)].collect().toSeq
      assert(got == want, s"seed $seed")
    }
  }

  test("suggest: prefix completions ranked by collection frequency") {
    val docs = Seq((1L, "scan scan sort spark other"),
      (2L, "scan sort zebra")).toDF("doc_id", "text")
    val got = Search.suggest(docs, Seq("text"), "s", 2)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("scan", 3L), ("sort", 2L)))
  }

  test("highlight wraps the first match with context bounds clamped") {
    val docs = Seq(
      (1L, "The WINDOW opens"),            // case-folded match at pos 5
      (2L, "no match here"),
      (3L, "window first")                 // match at pos 1: clamp
    ).toDF("doc_id", "text")
    val got = Search.highlight(docs, "doc_id", "text", "window", 3, 3)
      .as[(Long, Long, String)].collect().map(r => r._1 -> ((r._2, r._3)))
      .toMap
    assert(got == Map(
      1L -> ((5L, "he <em>window</em> op")),
      3L -> ((1L, "<em>window</em> fi"))))
  }

  test("percolate: randomized corpora match brute force (3 seeds)") {
    val vocab = Vector("w0", "w1", "w2", "w3", "w4", "w5", "w6", "w7")
    for (seed <- Seq(3, 29, 67)) {
      val rnd = new scala.util.Random(seed)
      val corpus = (1 to 60).map(i =>
        (i.toLong, Seq.fill(2 + rnd.nextInt(8))(
          vocab(rnd.nextInt(vocab.size))).mkString(" ")))
      val stored = (1 to 6).map(qi =>
        (qi.toLong, rnd.shuffle(vocab.toList).take(1 + rnd.nextInt(3))))
      val want = (for {
        (did, text) <- corpus
        toks = text.split(" ").toSet
        (qid, terms) <- stored if terms.forall(toks)
      } yield (did, qid)).toSet
      val got = Search.percolate(corpus.toDF("doc_id", "text"),
          "doc_id", Seq("text"), stored.toDF("query_id", "terms"))
        .select("doc_id", "query_id").as[(Long, Long)].collect().toSet
      assert(got == want, s"seed $seed")
    }
  }

  test("significantTerms: randomized corpora match a Scala JLH (3 seeds)") {
    val vocab = Vector("t0", "t1", "t2", "t3", "t4", "t5")
    for (seed <- Seq(31, 73, 127)) {
      val rnd = new scala.util.Random(seed)
      val corpus = (1 to 50).map(i =>
        (i.toLong, Seq.fill(1 + rnd.nextInt(5))(
          vocab(rnd.nextInt(vocab.size))).mkString(" ")))
      val fgIds = corpus.map(_._1).filter(_ => rnd.nextBoolean()).toSet
      val docTerms = corpus.map { case (id, t) => id -> t.split(" ").toSet }
      val nf = fgIds.size.toLong; val nb = corpus.size.toLong
      val want = vocab.flatMap { term =>
        val fg = docTerms.count { case (id, ts) =>
          fgIds(id) && ts(term) }.toLong
        val bg = docTerms.count(_._2(term)).toLong
        if (fg == 0L) None
        else {
          val fr = fg.toDouble / nf.toDouble
          val br = bg.toDouble / nb.toDouble
          Some((term, fg, bg,
            math.floor((fr - br) * (fr / br) * 1e6 + 0.5).toLong))
        }
      }.sortBy(r => (-r._4, r._1)).take(10)
      val got = Search.significantTerms(corpus.toDF("doc_id", "text"),
          "doc_id", Seq("text"),
          col("doc_id").isin(fgIds.toSeq: _*), k = 10)
        .as[(String, Long, Long, Long)].collect().toSeq
      assert(got == want, s"seed $seed")
    }
  }

  test("significantTerms: JLH rewards foreground lift, hand-computed") {
    val docs = Seq((1L, "hot alpha"), (2L, "hot beta"),
      (3L, "alpha beta"), (4L, "alpha")).toDF("doc_id", "text")
    val got = Search.significantTerms(docs, "doc_id", Seq("text"),
        col("doc_id") <= 2L, k = 10)
      .as[(String, Long, Long, Long)].collect().toSeq
    // hot: fr=1 br=.5 → .5·2 = 1.0; beta: fr=br=.5 → 0;
    // alpha: fr=.5 br=.75 → −.25·(2/3) → floor(−166666.17) = −166667
    assert(got == Seq(("hot", 2L, 2L, 1000000L),
      ("beta", 1L, 2L, 0L), ("alpha", 1L, 3L, -166667L)))
  }
}
