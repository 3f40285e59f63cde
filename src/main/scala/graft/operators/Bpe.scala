package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Analyzer

/** Byte-pair-encoding merge training (Sennrich et al. 2016, "Neural
  * Machine Translation of Rare Words with Subword Units" §3.2) — the
  * tokenizer-training half of a training-data pipeline, next to
  * [[TextAnalysis.vocabCoverage]]'s corpus-side prep.
  *
  * The classic algorithm is a sequential loop over a WORD-TYPE table
  * (word → corpus frequency), not the corpus: count adjacent symbol
  * pairs weighted by word frequency, merge the most frequent pair
  * everywhere, repeat. That structure is exactly what makes it
  * distributable at 100 TB: the corpus crosses the shuffle ONCE, as
  * word types with map-side-combined counts (the KenLM property —
  * state is type-cardinality-bound, ~millions of rows for any corpus
  * size), and each merge round touches only that small table.
  *
  * Per-round plan shape (nothing ever reaches the driver):
  *   - pair counts: scan-local adjacent-pair expansion over the symbol
  *     arrays (one `transform` over indices), ONE groupBy(l, r) shuffle
  *     of pair types.
  *   - winner: `orderBy(count DESC, l, r).limit(1)` — a TakeOrdered of
  *     pair types, broadcast back as a 1-row build side.
  *   - merge application: an `aggregate` fold over each symbol array —
  *     scan-local, zero shuffle. The fold is exactly greedy
  *     left-to-right non-overlapping replacement: a just-merged
  *     element can never re-match as the left operand because the
  *     merged symbol `l ++ r` cannot equal `l` (r is non-empty), so
  *     fold-compare-last ≡ the classic walk-and-skip loop.
  *   - `localCheckpoint` cuts the per-round lineage (same discipline as
  *     the connected-components fixpoint in [[Dedup]]); without it
  *     round n replays rounds 1..n−1 once per downstream exchange.
  *
  * The whole computation is integer counts and string equality — no
  * floats anywhere — so the DuckDB oracle ([[graft.OracleBpe]]) replays
  * every round bit-for-bit, with greedy merging rendered relationally
  * (flag matching positions, group consecutive matches into runs,
  * merge the even offsets — provably the same greedy semantics).
  *
  * Reference anchor: the reference pipeline tokenizes with a fixed
  * off-the-shelf analyzer (sentiment_analysis_dag.py's TextBlob/VADER
  * tokenizations); BPE training is the beyond-reference capability a
  * training-data engine needs to BUILD such tokenizers from the corpus.
  */
object Bpe {

  /** End-of-word marker symbol. Outside the tokenizer's `[a-z0-9']`
    * alphabet, so it can never collide with a character symbol. */
  val Marker = "_"

  /** Corpus → word-type table (word, freq). The only pass over the
    * corpus; map-side combine collapses occurrences before the one
    * type-keyed shuffle. */
  def wordTypes(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(Analyzer.tokenize(coalesce(col(textCol), lit(""))))
        .as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** The persistable training state: `merges` — (rank, lhs, rhs,
    * pair_freq), rank-ordered — and `words` — (word, freq, syms), the
    * word-type table under the merges so far. Both are plain columnar
    * tables (syms is array<string>), so the pair round-trips through
    * parquet and training composes past the per-call round cap:
    * checkpoint the state, [[Bpe.resumeMerges]] later. */
  final case class BpeState(merges: DataFrame, words: DataFrame)

  /** Train `nMerges` BPE merges over the corpus' word types.
    * Output: one row per learned merge, in order —
    * (rank, lhs, rhs, pair_freq) with rank 1..nMerges. Ties on
    * pair_freq break deterministically by (lhs, rhs) ascending. If the
    * corpus exhausts (every word a single symbol) the output simply
    * has fewer rows. */
  def trainMerges(df: DataFrame, textCol: String, nMerges: Int): DataFrame =
    trainState(df, textCol, nMerges).merges

  /** The trained word-type vocabulary: each corpus word with its
    * frequency and its segmentation under the `nMerges` learned
    * merges, space-joined ("l o w _" → "low _"). Gates the APPLY path
    * end-to-end — this is trainMerges' final state table, the thing a
    * tokenizer build would persist next to the merge list. */
  def typeSegments(df: DataFrame, textCol: String, nMerges: Int): DataFrame =
    trainState(df, textCol, nMerges).words
      .select(col("word"), col("freq"),
        array_join(col("syms"), " ").as("pieces"))

  /** [[trainMerges]] returning the full resumable state. */
  def trainState(df: DataFrame, textCol: String, nMerges: Int): BpeState = {
    // word → initial symbol array: characters + end-of-word marker.
    // substring-by-index (not split("")) for exact parity with the
    // oracle's [word[i:i] for i in ...] rendering.
    val words0 = wordTypes(df, textCol)
      .select(col("word"), col("freq"),
        concat(
          transform(sequence(lit(1), length(col("word"))),
            i => col("word").substr(i, lit(1))),
          array(lit(Marker))).as("syms"))
      .localCheckpoint()
    mergeRounds(words0, prior = None, startRank = 1L, nRounds = nMerges)
  }

  /** Continue training from a persisted state: `nMore` further merge
    * rounds on top of an earlier run's (merges, words) pair — real
    * tokenizers need 30k+ merges, far past any single call's round
    * cap, so training runs as CHAINED CHUNKS with the state tables
    * parquet-checkpointed between chunks (each chunk re-enters here
    * with the tables read back). Chaining is exact: round n sees
    * precisely the symbol state one longer run would have (BpeSpec
    * proves 2×8 resumed ≡ 16 one-shot, through a parquet round-trip).
    * New ranks continue from max(rank)+1. */
  def resumeMerges(words: DataFrame, merges: DataFrame, nMore: Int): BpeState = {
    val next = merges.agg(coalesce(max(col("rank")), lit(0L)))
      .head().getLong(0) + 1
    mergeRounds(words.localCheckpoint(), prior = Some(merges),
      startRank = next, nRounds = nMore)
  }

  private def mergeRounds(words0: DataFrame, prior: Option[DataFrame],
                          startRank: Long, nRounds: Int): BpeState = {
    require(nRounds >= 1 && nRounds <= 64,
      s"rounds per call must be in [1, 64] — each merge is a driver-side " +
        s"round; train larger vocabs in chunks via resumeMerges (got $nRounds)")
    val spark = words0.sparkSession

    var words = words0
    var merges: Option[DataFrame] = prior
    var r = startRank
    val endRank = startRank + nRounds - 1
    var exhausted = false
    while (r <= endRank && !exhausted) {
      // adjacent-pair types, weighted by word frequency. Fully-merged
      // words (one symbol left) have no pairs — and must be filtered
      // BEFORE sequence(1, size-1), which would otherwise descend
      // ([1, 0]) and index out of bounds.
      val pairCounts = words
        .filter(size(col("syms")) >= 2)
        .select(col("freq"),
          explode(transform(sequence(lit(1), size(col("syms")) - 1),
            i => struct(element_at(col("syms"), i).as("l"),
              element_at(col("syms"), i + 1).as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("c"))
      val best = pairCounts
        .orderBy(col("c").desc, col("l"), col("r")).limit(1)
        .localCheckpoint()
      if (best.isEmpty) {
        exhausted = true
      } else {
        val row = best.select(lit(r).as("rank"), col("l").as("lhs"),
          col("r").as("rhs"), col("c").as("pair_freq"))
        merges = Some(merges.fold(row)(_.unionByName(row)))
        // greedy merge as a scan-local fold; see object Scaladoc for
        // the fold ≡ greedy argument. get() (not element_at) so the
        // empty initial accumulator yields null, not an ANSI error.
        words = words
          .crossJoin(broadcast(best.select(col("l").as("bl"), col("r").as("br"))))
          .withColumn("syms",
            aggregate(col("syms"), array().cast("array<string>"),
              (acc, s) => when(
                get(acc, size(acc) - 1) === col("bl") && s === col("br"),
                concat(slice(acc, lit(1), size(acc) - 1),
                  array(concat(col("bl"), col("br")))))
                .otherwise(concat(acc, array(s)))))
          .select(col("word"), col("freq"), col("syms"))
          .localCheckpoint()
      }
      r += 1
    }
    val mergesDf = merges.getOrElse {
      import spark.implicits._
      Seq.empty[(Long, String, String, Long)]
        .toDF("rank", "lhs", "rhs", "pair_freq")
    }
    BpeState(mergesDf, words)
  }

  /** Corpus-weighted tokenizer FERTILITY under the learned merges —
    * the metric a tokenizer build is judged by (mean subword pieces
    * per token occurrence; Sennrich et al. report it as "number of
    * subword units per word"): one row of
    * (n_word_types, n_tokens, n_pieces, fertility, split_frac) where
    * fertility = Σ freq·|pieces| / Σ freq and split_frac is the
    * occurrence fraction of words left in >1 piece (the end-of-word
    * marker counts as a piece until a merge absorbs it — the raw
    * symbol-table convention, stated so the metric is exact). All
    * integer sums over the word-TYPE table + two divisions of
    * identical BIGINTs — engine-portable like every stat here.
    * Scale: the type table is vocab-sized; the aggregate is one row. */
  def fertility(df: DataFrame, textCol: String, nMerges: Int): DataFrame =
    trainState(df, textCol, nMerges).words
      .agg(
        count(lit(1)).as("n_word_types"),
        sum(col("freq")).as("n_tokens"),
        sum(col("freq") * size(col("syms"))).as("n_pieces"),
        (sum(col("freq") * size(col("syms"))).cast("double")
          / sum(col("freq")).cast("double")).as("fertility"),
        (sum(when(size(col("syms")) > 1, col("freq")).otherwise(0L)).cast("double")
          / sum(col("freq")).cast("double")).as("split_frac"))

  /** Segment each word of `textCol` with a learned merge table —
    * the APPLY half (what a tokenizer does at training-data-prep
    * time). Merges must be applied in rank order; each application is
    * the same scan-local fold as training, so segmentation is one
    * zero-shuffle projection per merge over the corpus scan.
    * `mergeRows` is the (small, collected) merge table — model-sized,
    * like a broadcast codebook. Output: input columns + `pieces`
    * (array of subword symbols, marker-terminated). */
  def segment(df: DataFrame, textCol: String,
              mergeRows: Seq[(String, String)]): DataFrame = {
    val base = df.withColumn("pieces",
      flatten(transform(
        Analyzer.tokenize(coalesce(col(textCol), lit(""))),
        w => concat(
          transform(sequence(lit(1), length(w)), i => w.substr(i, lit(1))),
          array(lit(Marker))))))
    mergeRows.foldLeft(base) { case (acc, (l, rr)) =>
      acc.withColumn("pieces",
        aggregate(col("pieces"), array().cast("array<string>"),
          (a, s) => when(
            get(a, size(a) - 1) === lit(l) && s === lit(rr),
            concat(slice(a, lit(1), size(a) - 1), array(lit(l + rr))))
            .otherwise(concat(a, array(s)))))
    }
  }
}
