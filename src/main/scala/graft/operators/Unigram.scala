package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer training (Kudo 2018, "Subword Regularization"
  * §3; the SentencePiece unigram model) — the OTHER tokenizer family
  * next to [[Bpe]]: instead of growing merges bottom-up, start from a
  * large seed vocabulary of substrings, fit piece probabilities to the
  * corpus, and keep the pieces the fitted model actually uses.
  *
  * This is the HARD-EM variant with count pruning: the E-step is a
  * VITERBI segmentation (each word type takes its single best
  * segmentation under the current model — Kudo's l=1 decoding) rather
  * than full forward–backward expected counts, and pruning keeps the
  * highest-count pieces rather than ranking by likelihood loss. Both
  * simplifications are standard (hard-EM is the l=1 case of Kudo §3.2;
  * count pruning is its first-order approximation) and they buy the
  * property everything in this engine is built around: EVERY quantity
  * is an integer — piece counts, micro-nat logprobs
  * (floor(ln·1e6 + 0.5), the q70 grid), Viterbi path scores (BIGINT
  * sums of quantized logprobs) — so the whole training loop, DP
  * included, replays bit-for-bit in SQL ([[graft.OracleUnigram]]).
  *
  * Training schedule (fixed, unrolled — the q66/q78 discipline):
  *   1. seed: every substring of length 1..maxPieceLen of every word
  *      type, occurrence-counted weighted by word frequency;
  *      add-one logprobs over the seed table;
  *   2. E₁: Viterbi-segment the word types under the seed model;
  *   3. prune: keep ALL single-char pieces (coverage — every word
  *      stays segmentable) + the top `vocabSize` multi-char pieces by
  *      (E₁ count DESC, piece ASC), count ≥ 1;
  *   4. M₁: add-one logprobs over the kept vocabulary from E₁ counts;
  *   5. E₂/M₂: segment again under the fitted model, recount, refit.
  *
  * Scale shape: the corpus crosses the shuffle ONCE as word types
  * (the [[Bpe.wordTypes]] map-side-combined pass — type-cardinality-
  * bound state, the KenLM property); each EM round is scan-local
  * Viterbi over the type table (model broadcast, the
  * bigramScoreBroadcast pattern) plus one piece-keyed count shuffle.
  * Nothing corpus-sized ever moves after the first pass, and the
  * model is vocabulary-sized end to end.
  *
  * Viterbi determinism: ties on path score break on the lexicographic
  * order of the pipe-joined segmentation string. The suffix DP
  * carries (score, best-suffix-seg); min-lex composes over suffixes
  * (for a fixed split the joined string is monotone in its suffix),
  * so the greedy per-position choice equals the global
  * (score DESC, seg ASC) argmax the oracle computes over ALL
  * enumerated paths. All symbols are ASCII, so Java and DuckDB
  * compare identically.
  */
object Unigram {

  /** The fitted model + the corpus word types it was fitted on. */
  final case class UnigramState(vocab: DataFrame, words: DataFrame)

  /** Every substring of length 1..maxPieceLen of every word type,
    * occurrence-counted (all positions, weighted by word freq). */
  def seedVocab(words: DataFrame, maxPieceLen: Int): DataFrame = {
    val subs = flatten(transform(
      sequence(lit(1), length(col("word"))),
      i => transform(
        sequence(lit(1), least(lit(maxPieceLen), length(col("word")) - i + 1)),
        l => col("word").substr(i, l))))
    words.select(explode(subs).as("piece"), col("freq"))
      .groupBy(col("piece"))
      .agg(sum(col("freq")).as("cnt"))
  }

  /** Add-one-smoothed micro-nat logprobs over a (piece, cnt) table:
    * lp_q = floor(ln((cnt+1)/(Σcnt+|V|))·1e6 + 0.5). Add-one keeps
    * zero-count coverage pieces finite, and the arithmetic —
    * BIGINT adds, one double division, one ln, one floor — renders
    * identically in both engines. */
  def withLogProbs(vocab: DataFrame): DataFrame = {
    val tot = vocab.agg(
      sum(col("cnt")).as("__tot"), count(lit(1)).as("__nv"))
    vocab.crossJoin(broadcast(tot))
      .withColumn("lp_q",
        floor(log((col("cnt") + 1L).cast("double") /
          (col("__tot") + col("__nv")).cast("double")) * 1e6 + lit(0.5))
          .cast("long"))
      .drop("__tot", "__nv")
  }

  /** E-step: Viterbi-segment each word type under the broadcast model.
    * Output: (word, freq, seg pipe-joined, n_pieces, score_q). Words
    * with no path under the vocabulary (impossible once single-char
    * coverage is kept) yield a null seg and are filtered. */
  def viterbiSegment(words: DataFrame, vocab: DataFrame,
                     maxPieceLen: Int): DataFrame = {
    val model: Map[String, Long] = vocab
      .select(col("piece"), col("lp_q"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val bc = words.sparkSession.sparkContext.broadcast(model)
    val mp = maxPieceLen
    val segUdf = udf { (word: String) =>
      val n = word.length
      val score = new Array[Long](n + 1)
      val seg = new Array[String](n + 1)
      seg(n) = ""
      var i = n - 1
      while (i >= 0) {
        var bs = Long.MinValue
        var bg: String = null
        var l = 1
        while (l <= mp && i + l <= n) {
          val lp = bc.value.get(word.substring(i, i + l))
          if (lp.isDefined && seg(i + l) != null) {
            val s = lp.get + score(i + l)
            val g = if (i + l == n) word.substring(i, i + l)
                    else word.substring(i, i + l) + "|" + seg(i + l)
            if (s > bs || (s == bs && g.compareTo(bg) < 0)) { bs = s; bg = g }
          }
          l += 1
        }
        score(i) = bs; seg(i) = bg
        i -= 1
      }
      if (seg(0) == null) null else (seg(0), score(0))
    }
    words.withColumn("__v", segUdf(col("word")))
      .filter(col("__v").isNotNull)
      .select(col("word"), col("freq"),
        col("__v._1").as("seg"),
        size(split(col("__v._1"), "\\|")).cast("long").as("n_pieces"),
        col("__v._2").as("score_q"))
  }

  /** M-step counts: piece occurrences across the segmented types,
    * weighted by word frequency. One piece-keyed shuffle. */
  def emCounts(segmented: DataFrame): DataFrame =
    segmented
      .select(explode(split(col("seg"), "\\|")).as("piece"), col("freq"))
      .groupBy(col("piece"))
      .agg(sum(col("freq")).as("cnt"))

  /** ONE post-prune EM round over a fixed piece set: E = Viterbi
    * segmentation of the word types under `state.vocab`, M = recount +
    * add-one refit over the SAME pieces (zero-count coverage pieces
    * kept via the left join). The piece set never changes after
    * pruning, so rounds compose: round(round(s)) is exactly two
    * rounds — the property [[resumeEm]]'s resumability rests on. */
  def emRound(state: UnigramState, maxPieceLen: Int = 4): UnigramState = {
    val c = emCounts(viterbiSegment(state.words, state.vocab, maxPieceLen))
    val vocab = withLogProbs(
      state.vocab.select(col("piece"))
        .join(c, Seq("piece"), "left")
        .select(col("piece"), coalesce(col("cnt"), lit(0L)).as("cnt")))
    UnigramState(vocab, state.words)
  }

  /** Resume training from a (possibly reloaded — [[loadState]]) state:
    * `n` more EM rounds. Each round localCheckpoints its vocab — the
    * vocab is model-sized, and the cut keeps the lineage flat across
    * arbitrarily many resumed rounds (chained 2+2 and one-shot 4 build
    * the SAME fitted model, spec'd). */
  def resumeEm(state: UnigramState, n: Int,
               maxPieceLen: Int = 4): UnigramState = {
    require(n >= 0, s"n must be >= 0 (got $n)")
    (1 to n).foldLeft(state) { (s, _) =>
      val next = emRound(s, maxPieceLen)
      UnigramState(next.vocab.localCheckpoint(), next.words)
    }
  }

  /** Parquet round-trip of the fitted state: `dir/vocab` (piece, cnt,
    * lp_q) + `dir/words` (word, freq) — both model/type-sized, all
    * columns exact (strings + BIGINTs), so a reloaded state resumes
    * bit-for-bit. */
  def saveState(state: UnigramState, dir: String): Unit = {
    state.vocab.write.mode("overwrite").parquet(s"$dir/vocab")
    state.words.write.mode("overwrite").parquet(s"$dir/words")
  }

  def loadState(spark: org.apache.spark.sql.SparkSession,
                dir: String): UnigramState =
    UnigramState(
      spark.read.parquet(s"$dir/vocab"),
      spark.read.parquet(s"$dir/words"))

  /** The full schedule (object doc). Returns the fitted state:
    * vocab = (piece, cnt, lp_q) after E₂/M₂ — zero-count coverage
    * pieces included — and the word-type table. The tail IS
    * [[emRound]]: trainState ≡ seed → E₁ → prune/M₁ → emRound. */
  def trainState(df: DataFrame, textCol: String, vocabSize: Int,
                 maxPieceLen: Int = 4): UnigramState = {
    require(vocabSize >= 1, s"vocabSize must be >= 1 (got $vocabSize)")
    require(maxPieceLen >= 1, s"maxPieceLen must be >= 1 (got $maxPieceLen)")
    val words = Bpe.wordTypes(df, textCol).localCheckpoint()
    val seed = withLogProbs(seedVocab(words, maxPieceLen))
    val c1 = emCounts(viterbiSegment(words, seed, maxPieceLen))
      .localCheckpoint()
    // prune: all single-char pieces (from the SEED table, so unused
    // chars survive with cnt 0) + top-K multi-char by (cnt, piece).
    val chars = seedVocab(words, 1).select(col("piece"))
      .join(c1, Seq("piece"), "left")
      .select(col("piece"), coalesce(col("cnt"), lit(0L)).as("cnt"))
    val multis = c1.filter(length(col("piece")) > 1)
      .orderBy(col("cnt").desc, col("piece"))
      .limit(vocabSize)
    val kept = withLogProbs(chars.unionByName(multis))
    emRound(UnigramState(kept, words), maxPieceLen)
  }

  /** The fitted vocabulary: (piece, cnt, lp_q). */
  def trainVocab(df: DataFrame, textCol: String, vocabSize: Int,
                 maxPieceLen: Int = 4): DataFrame =
    trainState(df, textCol, vocabSize, maxPieceLen).vocab

  /** The apply path: corpus word types segmented under the fitted
    * model — (word, freq, seg, n_pieces, score_q), the unigram
    * sibling of [[Bpe.typeSegments]]. */
  def typeSegments(df: DataFrame, textCol: String, vocabSize: Int,
                   maxPieceLen: Int = 4): DataFrame = {
    val st = trainState(df, textCol, vocabSize, maxPieceLen)
    viterbiSegment(st.words, st.vocab, maxPieceLen)
  }
}
