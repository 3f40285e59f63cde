package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Analyzer

/** Corpus reporting — the "data card" a training-data pipeline ships
  * with every corpus release (Gebru et al. 2021 "Datasheets for
  * Datasets"; Bender & Friedman 2018 data statements). The reference
  * exposes ad-hoc stats endpoints (`get_sentiment_stats`,
  * api/sentiment_api.py) — this is the corpus-level generalization: one
  * aggregation pass that answers "what is in this dataset, per slice"
  * before anyone trains on it.
  *
  * One row per `groupCol` value: document count, token/char volume,
  * empty-doc count, distinct predicted languages (the engine's own
  * [[TextAnalysis.withLangId]] — the report is self-contained, no
  * external metadata), and the exact median token count.
  *
  * Scale shape: everything is ONE map-side-combined aggregation keyed
  * by the group column — partials are group-cardinality-sized, the
  * corpus crosses the wire never (tokenization and counting are
  * scan-local). `percentile` is the exact form (the q39 contract,
  * interpolation ≡ DuckDB `quantile_cont`); its per-group value
  * buffer is the one term that grows with group size, which is fine
  * at source granularity (thousands of groups) — for a
  * high-cardinality slice swap in `percentile_approx`, the x25/x30
  * sketch trade. */
object Report {

  /** The per-slice corpus card. Output: (groupCol, n_docs, n_tokens,
    * n_chars, n_empty, n_langs, p50_tokens). */
  def corpusCard(docs: DataFrame, textCol: String,
                 groupCol: String): DataFrame = {
    val txt = coalesce(col(textCol), lit(""))
    val toks = Analyzer.tokenize(txt)
    val best = TextAnalysis.langBest(txt)
    docs
      .select(col(groupCol),
        size(toks).cast("long").as("__nt"),
        length(txt).cast("long").as("__nc"),
        when(length(txt) === 0, 1L).otherwise(0L).as("__empty"),
        when(best.getField("score") > 0, best.getField("lang"))
          .otherwise("und").as("__lang"))
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("__nt")).as("n_tokens"),
        sum(col("__nc")).as("n_chars"),
        sum(col("__empty")).as("n_empty"),
        countDistinct(col("__lang")).as("n_langs"),
        percentile(col("__nt"), lit(0.5)).as("p50_tokens"))
  }

  /** The card WITHOUT the rescan: assemble the per-slice release card
    * from incrementally-maintained ledgers ([[StatsLedger]] moments +
    * histogram, [[Sketch]] HLL registers) — the read is ledger-sized
    * (keys, keys×bins, keys×64 rows), so at 100 TB the card costs the
    * same as at 100 MB once the ledgers exist. One row per key:
    * exact doc count / char sum / min / max / second moment, the HLL
    * distinct-text estimate, and p50/p90/p99 length bands.
    *
    * All three joins are key-cardinality-sized (broadcast under AQE).
    */
  def cardFromLedgers(stats: DataFrame, hllRegs: DataFrame,
                      hist: DataFrame): DataFrame = {
    val est = Sketch.hllEstimate(hllRegs).select(col("key"), col("est_q"))
    val bands = StatsLedger.histPercentiles(hist, Seq(50, 90, 99))
      .groupBy(col("key")).agg(
        max(when(col("p") === 50L, col("lo"))).as("p50_lo"),
        max(when(col("p") === 50L, col("hi"))).as("p50_hi"),
        max(when(col("p") === 90L, col("lo"))).as("p90_lo"),
        max(when(col("p") === 90L, col("hi"))).as("p90_hi"),
        max(when(col("p") === 99L, col("lo"))).as("p99_lo"),
        max(when(col("p") === 99L, col("hi"))).as("p99_hi"))
    stats.join(est, "key").join(bands, "key")
  }
}
