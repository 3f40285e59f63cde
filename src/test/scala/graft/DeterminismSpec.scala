package graft

/** Partitioning invariance: the property that actually transfers from
  * local[n] to a 1000-executor cluster. Every query must produce the
  * same row SET regardless of `spark.sql.shuffle.partitions` — this
  * catches nondeterminism (arbitrary tie-breaks, collect_list order,
  * per-partition top-k) that small-scale runs hide. Representative
  * sample: aggregates, window top-k, as-of join, repetition stats,
  * and the LSH dedup family (checkpoint + broadcast paths). */
class DeterminismSpec extends SparkSpec {

  private val sample = Seq(
    "q01_pricing_summary", "q21_window_topk", "q34_shipping_priority",
    "q38_string_agg", "q44_asof_join", "q47_repetition", "q48_pack_bins",
    "q59_paragraph_dedup", "q60_lm_score", "q61_vocab_coverage",
    "q64_lm_score_holdout", "q67_substring_dedup", "q68_decontaminate_bloom",
    "q69_dedup_quality_keeper", "q70_trigram_lm",
    "x09_minhash_dedup", "x10_simhash_dedup", "x18_dedup_verdicts",
    "x24_semdedup", "x27_cosine_topk_batch",
    // round-5 additions: driver-loop training rounds (BPE), the
    // sketch aggregate, the cross-corpus probe, and the full-recipe
    // funnel (every stage composed, incl. CC + keeper tie-breaks)
    "q71_cms_token_freq", "q72_bpe_merges", "x28_incremental_dedup",
    "q74_corpus_funnel",
    // round-6: Kneser-Ney (continuation counts + discount arithmetic
    // + ARPA-walk integer sums) and the hash-keyed ExactSubstr mode
    "q75_kn_trigram_lm", "x29_substring_dedup_hash", "q76_dsir_weights",
    // round-8: the suffix-rank rewrite (doubling chain + in-place
    // dense rank + window winner election at arbitrary widths) and
    // the two-key blocking pass (candidate union + pair dedup)
    "q100_suffix_rewrite", "q99_fuzzy_pairs_2key",
    // round-9: fixed-point PageRank (the bit-exactness IS the design
    // claim), and the two fold-in ledgers (merge order must not leak)
    "q102_pagerank", "q103_stats_ledger", "q104_hll_ledger",
    "q105_hist_ledger", "q106_topk_ledger", "q107_sample_ledger",
    "q108_card_inc", "q109_card_stream", "q110_gapfill", "q111_card_asof", "q112_hopping_window", "q113_retention", "q114_event_funnel")

  private def run(name: String, partitions: Int): Seq[String] = {
    spark.conf.set("spark.sql.shuffle.partitions", partitions)
    try SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
      .collect().map(_.toString).sorted.toSeq
    finally spark.conf.set("spark.sql.shuffle.partitions", 4)
  }

  for (name <- sample)
    test(s"$name: same rows at 2 and 13 shuffle partitions") {
      assert(run(name, 2) == run(name, 13))
    }
}
