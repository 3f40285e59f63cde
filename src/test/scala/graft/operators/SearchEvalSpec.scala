package graft.operators

import graft.SparkSpec

/** Ranking metrics: hand-computed MRR/P@k/recall/nDCG, unjudged and
  * no-hit edge cases, and the pinned DCG fold order. */
class SearchEvalSpec extends SparkSpec {
  import spark.implicits._

  private val ln2 = StrictMath.log(2.0)
  private def gain(rel: Long, rank: Long): Double =
    ((1L << rel) - 1).toDouble * ln2 / StrictMath.log((rank + 1).toDouble)
  private def micro(x: Double): Long = math.floor(x * 1e6 + 0.5).toLong

  test("per-query metrics match hand computation") {
    val rankings = Seq(
      ("q1", 1L, 1L), ("q1", 2L, 2L), ("q1", 3L, 3L),
      ("q2", 1L, 1L), ("q2", 2L, 2L),   // judged but nothing relevant retrieved
      ("q3", 7L, 1L)                    // no qrels at all for q3
    ).toDF("qid", "doc_id", "rank")
    val qrels = Seq(
      ("q1", 2L, 1L), ("q1", 3L, 2L), ("q1", 9L, 3L),
      ("q2", 5L, 2L)
    ).toDF("qid", "doc_id", "rel")
    val out = SearchEval.rankingMetrics(rankings, qrels, k = 3)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6)))).toMap

    // q1: 3 judged; retrieved rel = (0, 1, 2) at ranks 1..3
    val dcg = gain(0, 1) + gain(1, 2) + gain(2, 3)
    val idcg = gain(3, 1) + gain(2, 2) + gain(1, 3)
    assert(out("q1") == ((3L, 2L, 500000L,          // first rel at rank 2
      micro(2.0 / 3.0), micro(2.0 / 3.0), micro(dcg / idcg))))
    // q2: 1 judged, none retrieved → everything zero except p/recall denom
    assert(out("q2") == ((1L, 0L, 0L, 0L, 0L, 0L)))
    // q3: no qrels → all zero, no division blow-ups
    assert(out("q3") == ((0L, 0L, 0L, 0L, 0L, 0L)))
    // AP@3: hits at ranks 2,3 → (1/2 + 2/3) / min(R=3, k=3)
    val aps = SearchEval.rankingMetrics(rankings, qrels, k = 3)
      .collect().map(r => r.getString(0) -> r.getLong(7)).toMap
    assert(aps("q1") == micro((0.0 + 1.0 / 2.0 + 2.0 / 3.0) / 3.0))
    assert(aps("q2") == 0L && aps("q3") == 0L)
  }

  test("perfect ranking scores nDCG = 1 and MRR = 1") {
    val rankings = Seq(("q", 1L, 1L), ("q", 2L, 2L)).toDF("qid", "doc_id", "rank")
    val qrels = Seq(("q", 1L, 3L), ("q", 2L, 1L)).toDF("qid", "doc_id", "rel")
    val r = SearchEval.rankingMetrics(rankings, qrels, 2).collect()(0)
    assert(r.getLong(3) == 1000000L)   // mrr
    assert(r.getLong(6) == 1000000L)   // ndcg
    assert(r.getLong(7) == 1000000L)   // ap: (1/1 + 2/2) / 2
  }

  test("ideal list truncates at k (IDCG@k, not IDCG@all)") {
    // 3 judged rel=1 docs, k=2: idcg uses only the best 2
    val rankings = Seq(("q", 1L, 1L), ("q", 2L, 2L)).toDF("qid", "doc_id", "rank")
    val qrels = Seq(("q", 1L, 1L), ("q", 2L, 1L), ("q", 3L, 1L))
      .toDF("qid", "doc_id", "rel")
    val r = SearchEval.rankingMetrics(rankings, qrels, 2).collect()(0)
    assert(r.getLong(6) == 1000000L)   // retrieved == ideal top-2
    assert(r.getLong(5) == micro(2.0 / 3.0))  // recall over all 3 judged
  }

  test("randomized rankings/qrels match a plain-Scala scorer (3 seeds)") {
    val k = 5
    for (seed <- Seq(19, 61, 103)) {
      val rnd = new scala.util.Random(seed)
      val qids = (1 to 8).map(q => s"q$q")
      val rankRows = qids.flatMap { q =>
        rnd.shuffle((1L to 20L).toList).take(3 + rnd.nextInt(8))
          .zipWithIndex.map { case (d, i) => (q, d, (i + 1).toLong) }
      }
      val qrelRows = qids.flatMap { q =>
        rnd.shuffle((1L to 25L).toList).take(rnd.nextInt(6))
          .map(d => (q, d, (1 + rnd.nextInt(3)).toLong))
      }
      val want = qids.map { q =>
        val topk = rankRows.filter(r => r._1 == q && r._3 <= k)
          .sortBy(_._3)
        val rels = qrelRows.filter(_._1 == q)
          .map(r => r._2 -> r._3).toMap
        val rr = topk.map(r => (r._3, rels.getOrElse(r._2, 0L)))
        val nJudged = rels.size.toLong
        val nRel = rr.count(_._2 > 0L).toLong
        val first = rr.find(_._2 > 0L).map(_._1)
        val dcg = rr.foldLeft(0.0) { case (a, (rk, rl)) => a + gain(rl, rk) }
        val ideal = rels.values.toSeq.sorted.reverse.take(k)
        val idcg = ideal.zipWithIndex.foldLeft(0.0) {
          case (a, (rl, i)) => a + gain(rl, i + 1L) }
        var hits = 0L
        val apSum = rr.foldLeft(0.0) { case (a, (rk, rl)) =>
          if (rl > 0L) { hits += 1; a + hits.toDouble / rk.toDouble }
          else a }
        q -> ((nJudged, nRel,
          first.map(f => micro(1.0 / f.toDouble)).getOrElse(0L),
          micro(nRel.toDouble / k.toDouble),
          if (nJudged == 0L) 0L else micro(nRel.toDouble / nJudged.toDouble),
          if (idcg <= 0.0) 0L else micro(dcg / idcg),
          if (nJudged == 0L) 0L
          else micro(apSum / math.min(nJudged, k.toLong).toDouble)))
      }.toMap
      val got = SearchEval.rankingMetrics(
          rankRows.toDF("qid", "doc_id", "rank"),
          qrelRows.toDF("qid", "doc_id", "rel"), k)
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
            r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
      assert(got == want, s"seed $seed")
    }
  }

  test("systemSummary averages the per-query micro metrics") {
    val rankings = Seq(("q1", 1L, 1L), ("q2", 1L, 1L))
      .toDF("qid", "doc_id", "rank")
    val qrels = Seq(("q1", 1L, 1L), ("q2", 9L, 1L))
      .toDF("qid", "doc_id", "rel")
    // q1 perfect (mrr 1e6), q2 total miss (0) → means are halves
    val r = SearchEval.systemSummary(
      SearchEval.rankingMetrics(rankings, qrels, 1)).collect()(0)
    assert(r.getLong(0) == 2L)          // n_queries
    assert(r.getLong(1) == 500000L)     // mean mrr
    assert(r.getLong(5) == 500000L)     // MAP
  }

  test("rankAgreement: hand-computed RBO at k=2, p=0.5") {
    def rk(rows: (Long, Long, Long)*) =
      rows.toDF("query_id", "id", "rank")
    // identical rankings: ov=(1,2) → s = 1 + 0.5 → rbo = 0.5·1.5 = 0.75
    val same = SearchEval.rankAgreement(
      rk((0L, 7L, 1L), (0L, 8L, 2L)), rk((0L, 7L, 1L), (0L, 8L, 2L)),
      k = 2, p = 0.5).collect()(0)
    assert((same.getLong(1), same.getLong(2), same.getLong(3)) ==
      ((2L, 1000000L, 750000L)))
    // swapped order: ov=(0,2) → s = 0 + 0.5·1 → rbo = 0.25
    val swap = SearchEval.rankAgreement(
      rk((0L, 7L, 1L), (0L, 8L, 2L)), rk((0L, 8L, 1L), (0L, 7L, 2L)),
      k = 2, p = 0.5).collect()(0)
    assert((swap.getLong(1), swap.getLong(3)) == ((2L, 250000L)))
    // disjoint: still one row, everything 0
    val disj = SearchEval.rankAgreement(
      rk((0L, 1L, 1L)), rk((0L, 2L, 1L)), k = 2, p = 0.5).collect()(0)
    assert((disj.getLong(1), disj.getLong(2), disj.getLong(3)) ==
      ((0L, 0L, 0L)))
  }
}
