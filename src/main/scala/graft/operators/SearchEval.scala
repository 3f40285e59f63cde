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
    * p_at_k_micro, recall_micro, ndcg_micro)`. */
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
    perQ.join(ideal, Seq("qid"), "left")
      .withColumn("n_judged", coalesce(col("n_judged"), lit(0L)))
      .withColumn("__dcg", dcg)
      .withColumn("__idcg", when(col("ideal_rels").isNull, lit(0.0))
        .otherwise(idcg))
      .select(col("qid"), col("n_judged"), col("n_rel_topk"),
        coalesce(micro(lit(1.0) / col("first_rel").cast("double")), lit(0L))
          .as("mrr_micro"),
        micro(col("n_rel_topk").cast("double") / lit(k.toDouble))
          .as("p_at_k_micro"),
        when(col("n_judged") === 0L, lit(0L))
          .otherwise(micro(col("n_rel_topk").cast("double") /
            col("n_judged").cast("double"))).as("recall_micro"),
        when(col("__idcg") <= 0.0, lit(0L))
          .otherwise(micro(col("__dcg") / col("__idcg"))).as("ndcg_micro"))
  }
}
