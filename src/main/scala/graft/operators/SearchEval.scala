package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ranking-quality evaluation — the measurement harness a search/
  * retrieval stack ships with (TREC's MRR / P@k / recall@k / nDCG@k,
  * Järvelin & Kekäläinen 2002): given a RANKING table
  * `(qid, doc_id, rank)` and a RELEVANCE table `(qid, doc_id, rel)`
  * (graded, rel ≥ 1; unjudged pairs simply absent), score each query.
  *
  * Deterministic to the bit, DuckDB-replayable:
  *   - every count is integral; MRR / P@k / recall@k take one double
  *     division each, micro-rounded;
  *   - DCG's float SUM ORDER is pinned by folding a rank-sorted gains
  *     array left-to-right (`aggregate`, the sqlFold discipline) —
  *     never a `sum()` over shuffled rows, whose order Spark does not
  *     define;
  *   - the only transcendental is ln(rank+1) on non-foldable ints
  *     (the BM25 StrictMath discipline), and ln2 enters as one
  *     Scala-rendered double literal;
  *   - IDCG ties (equal rel) cost nothing: the gain sequence is
  *     unique even where the doc order is not.
  *
  * Scale shape: one shuffle keys everything by qid; per-query state
  * is the top-k list and the judged set — report-sized. The corpus
  * appears only upstream, in whatever produced the ranking.
  */
object SearchEval {

  private val Ln2: Double = StrictMath.log(2.0)

  private def micro(c: Column): Column =
    floor(c * 1e6 + 0.5).cast("long")

  /** gain(rel) / discount(rank) for one (rank, rel) element. */
  private def gainAt(rel: Column, rank: Column): Column =
    (call_function("shiftleft", lit(1L), rel.cast("int")) - 1L)
      .cast("double") * Ln2 / log((rank + 1L).cast("double"))

  /** Per-query metrics: `(qid, n_judged, n_rel_topk, mrr_micro,
    * p_at_k_micro, recall_micro, ndcg_micro, ap_micro)`. AP@k is the
    * TREC form — (1/min(R,k)) Σ_{i≤k} P(i)·[rel_i>0] — folded over
    * the same rank-sorted array as DCG (running hit count carried in
    * a struct accumulator), so its float sum order is pinned too. */
  def rankingMetrics(rankings: DataFrame, qrels: DataFrame,
                     k: Int): DataFrame = {
    val topk = rankings.filter(col("rank") <= k)
      .select(col("qid"), col("doc_id"), col("rank"))
    val judged = qrels.select(col("qid"), col("doc_id"),
      col("rel").cast("long").as("rel"))
    val j = topk.join(judged, Seq("qid", "doc_id"), "left")
      .withColumn("rel", coalesce(col("rel"), lit(0L)))
    val perQ = j.groupBy(col("qid")).agg(
      sort_array(collect_list(struct(col("rank"), col("rel")))).as("rr"),
      min(when(col("rel") > 0L, col("rank"))).as("first_rel"),
      sum(when(col("rel") > 0L, 1L).otherwise(0L)).as("n_rel_topk"))
    val ideal = judged.groupBy(col("qid")).agg(
      count(lit(1)).as("n_judged"),
      slice(reverse(sort_array(collect_list(col("rel")))), 1, k)
        .as("ideal_rels"))
    val dcg = aggregate(col("rr"), lit(0.0),
      (acc, x) => acc + gainAt(x.getField("rel"), x.getField("rank")))
    val idcg = aggregate(
      zip_with(col("ideal_rels"),
        sequence(lit(1L), col("n_judged")
          .cast("long").alias("__n")), // ranks 1..|ideal| (≤ k after zip)
        (rel, rank) => struct(rel.as("rel"), rank.as("rank"))),
      lit(0.0),
      (acc, x) => when(x.getField("rel").isNull, acc)
        .otherwise(acc + gainAt(x.getField("rel"), x.getField("rank"))))
    val ap = aggregate(col("rr"),
      struct(lit(0L).as("h"), lit(0.0).as("s")),
      (acc, x) => {
        val hits = acc.getField("h") +
          when(x.getField("rel") > 0L, 1L).otherwise(0L)
        struct(hits.as("h"),
          (acc.getField("s") + when(x.getField("rel") > 0L,
            hits.cast("double") / x.getField("rank").cast("double"))
            .otherwise(lit(0.0))).as("s"))
      },
      acc => acc.getField("s"))
    perQ.join(ideal, Seq("qid"), "left")
      .withColumn("n_judged", coalesce(col("n_judged"), lit(0L)))
      .withColumn("__dcg", dcg)
      .withColumn("__idcg", when(col("ideal_rels").isNull, lit(0.0))
        .otherwise(idcg))
      .withColumn("__ap", ap)
      .select(col("qid"), col("n_judged"), col("n_rel_topk"),
        coalesce(micro(lit(1.0) / col("first_rel").cast("double")), lit(0L))
          .as("mrr_micro"),
        micro(col("n_rel_topk").cast("double") / lit(k.toDouble))
          .as("p_at_k_micro"),
        when(col("n_judged") === 0L, lit(0L))
          .otherwise(micro(col("n_rel_topk").cast("double") /
            col("n_judged").cast("double"))).as("recall_micro"),
        when(col("__idcg") <= 0.0, lit(0L))
          .otherwise(micro(col("__dcg") / col("__idcg"))).as("ndcg_micro"),
        when(col("n_judged") === 0L, lit(0L))
          .otherwise(micro(col("__ap") /
            least(col("n_judged"), lit(k.toLong)).cast("double")))
          .as("ap_micro"))
  }

  /** System-level summary over [[rankingMetrics]] output — the
    * leaderboard row: per-metric MEANS over queries (mean AP = MAP,
    * mean RR = MRR proper). Each mean is an integer sum of micro
    * values with one double division, so it replays exactly. */
  def systemSummary(perQuery: DataFrame): DataFrame = {
    def mean(c: String) =
      floor(sum(col(c)).cast("double") / count(lit(1)).cast("double")
        + 0.5).cast("long").as(s"mean_$c")
    perQuery.agg(count(lit(1)).as("n_queries"),
      mean("mrr_micro"), mean("p_at_k_micro"), mean("recall_micro"),
      mean("ndcg_micro"), mean("ap_micro"))
  }

  /** p^0 … p^(k−1) by successive multiplication — the same doubles
    * render as literals into both engines. */
  private[graft] def rboPowers(p: Double, k: Int): Seq[Double] =
    Seq.iterate(1.0, k)(_ * p)

  /** Agreement between two rankings of the same queries — overlap@k
    * and Rank-Biased Overlap (Webber, Moffat & Zobel 2010):
    * RBO@k = (1−p) · Σ_{d=1..k} p^(d−1) · |A_d ∩ B_d| / d.
    * The diagnostic behind hybrid fusion: how much do the lexical and
    * vector rankings actually agree before RRF merges them?
    *
    * Inputs are `(query_id, id, rank)`; output per query (every query
    * present in `a`, empty intersections scoring 0):
    * `(query_id, n_both, overlap_micro, rbo_micro)`.
    *
    * Determinism: prefix-overlap counts are integral (a doc enters at
    * depth max(rank_a, rank_b)); the p-powers are PRECOMPUTED doubles
    * rendered as literals (no pow() in either engine); the weighted
    * sum folds over d ascending — one pinned float tree, micro-
    * rounded. Per-query state is two top-k lists: report-sized. */
  def rankAgreement(a: DataFrame, b: DataFrame, k: Int,
                    p: Double): DataFrame = {
    val powers = rboPowers(p, k)
    val aa = a.filter(col("rank") <= k)
      .select(col("query_id"), col("id"), col("rank").as("__ra"))
    val bb = b.filter(col("rank") <= k)
      .select(col("query_id"), col("id"), col("rank").as("__rb"))
    val both = aa.join(bb, Seq("query_id", "id"))
      .select(col("query_id"),
        greatest(col("__ra"), col("__rb")).cast("long").as("__m"))
    val perQ = aa.select(col("query_id")).distinct()
      .join(both.groupBy(col("query_id"))
          .agg(sort_array(collect_list(col("__m"))).as("__ms"),
            count(lit(1)).as("n_both")),
        Seq("query_id"), "left")
      .withColumn("__ms",
        coalesce(col("__ms"), array().cast("array<long>")))
      .withColumn("n_both", coalesce(col("n_both"), lit(0L)))
    val wsum = aggregate(sequence(lit(1), lit(k)), lit(0.0), (acc, d) =>
      acc + element_at(typedlit(powers), d)
        * size(filter(col("__ms"), m => m <= d)).cast("double")
        / d.cast("double"))
    perQ.select(col("query_id"), col("n_both"),
      floor(col("n_both").cast("double") / lit(k.toDouble) * 1e6 + 0.5)
        .cast("long").as("overlap_micro"),
      floor(lit(1.0 - p) * wsum * 1e6 + 0.5).cast("long").as("rbo_micro"))
  }
}
