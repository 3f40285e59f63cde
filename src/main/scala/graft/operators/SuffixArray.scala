package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.Analyzer

/** Distributed suffix-array construction by PREFIX DOUBLING
  * (Manber & Myers 1993 §3; the Flick & Aluru 2015 distributed
  * formulation) — closing the gap SCALING.md names against Lee et
  * al. 2022's ExactSubstr: [[TextAnalysis.substringDedup]] detects
  * duplicated runs of ONE fixed window length k, while the doubling
  * ranks detect duplicated runs at threshold L = 2^K after K rounds —
  * ANY power-of-two length, with log₂(L) rounds of pure sorts and
  * equi-joins, the shapes Spark distributes natively.
  *
  * Construction, all integers end to end:
  *   - positions: each doc's analyzer tokens + a per-doc SENTINEL
  *     token `#<doc_id>` appended. Suffixes are doc-local `(doc_id,
  *     pos)` — the sentinel is unique per doc, so two suffixes can
  *     only compare equal over REAL tokens (any comparison window
  *     that reaches a sentinel separates them), which makes doc-local
  *     arrays equivalent to the classic concatenated-corpus
  *     construction without any global-offset prefix sum;
  *   - r₀: dense ranks of distinct tokens in lexicographic order
  *     (distinct-agg → distributed sort → zipWithIndex — rank VALUES
  *     are deterministic, so the oracle's `dense_rank() OVER (ORDER
  *     BY token)` reproduces them exactly);
  *   - round k: each position pairs its rank with the rank at
  *     `pos + 2^(k-1)` (−1 past the end) — ONE keyed self-join — and
  *     the distinct pairs are dense-ranked the same way. After round
  *     k, `rank` identifies the suffix's first 2^k tokens.
  *
  * Duplicated-run detection (the ExactSubstr verdict): after K =
  * log₂(minRun) rounds, a rank shared by ≥ 2 positions means those
  * suffixes agree on their first `minRun` tokens — a duplicated run,
  * within or across documents. Output: per-doc
  * `(doc_id, n_tokens, n_dup_starts)` — how many of the doc's
  * suffix positions start a run duplicated somewhere in the corpus.
  *
  * Scale shape: every round is (a) one `(doc_id, pos)`-keyed
  * self-join of the position table, (b) a distinct-agg of rank
  * pairs, (c) a distributed sort of the DISTINCT pairs (bounded by
  * the number of distinct 2^k-grams, ≤ positions, usually far
  * fewer), and (d) a join-back. Nothing is ever driver-sized except
  * the zipWithIndex cursor; `localCheckpoint` cuts per-round lineage
  * like the CC fixpoint. The full suffix ARRAY (ranks → order) falls
  * out of the final sort if needed; the dedup verdict needs only the
  * rank groups.
  */
object SuffixArray {

  /** Dense-rank `df`'s rows by `keys` (assumed distinct): distributed
    * sort + zipWithIndex, ranks 1..D appended as `out`. */
  private def denseRank(df: DataFrame, keys: Seq[String],
                        out: String): DataFrame = {
    val sorted = df.orderBy(keys.map(col): _*)
    val schema = sorted.schema.add(out, LongType, nullable = false)
    df.sparkSession.createDataFrame(
      sorted.rdd.zipWithIndex().map { case (r, i) =>
        Row.fromSeq(r.toSeq :+ (i + 1L))
      }, schema)
  }

  /** The doubling chain: per-round rank tables (k, ranks-after-round-k)
    * for k = 1..rounds, each localCheckpoint'ed so later consumers see
    * a flat lineage. After round k, `r` identifies the suffix's first
    * 2^k tokens. */
  private def doublingRounds(df: DataFrame, idCol: String,
                             textCol: String,
                             rounds: Int): Seq[(Int, DataFrame)] = {
    val toks = df.select(col(idCol).as("doc_id"),
      concat(
        Analyzer.tokenize(coalesce(col(textCol), lit(""))),
        array(concat(lit("#"), col(idCol).cast("string")))).as("__toks"))
    val pos = toks
      .select(col("doc_id"), posexplode(col("__toks")))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("pos"),
        col("col").as("__tk"))
    val r0 = denseRank(pos.select(col("__tk")).distinct(), Seq("__tk"), "r")
    var cur = pos.join(r0, "__tk")
      .select(col("doc_id"), col("pos"), col("r"))
      .localCheckpoint()
    (1 to rounds).map { k =>
      val step = 1L << (k - 1)
      val shifted = cur.select(col("doc_id"),
        (col("pos") - step).as("pos"), col("r").as("__r2"))
      val paired = cur.join(shifted, Seq("doc_id", "pos"), "left")
        .withColumn("__r2", coalesce(col("__r2"), lit(-1L)))
      val ranked = denseRank(
        paired.select(col("r"), col("__r2")).distinct(),
        Seq("r", "__r2"), "__nr")
      cur = paired.join(ranked, Seq("r", "__r2"))
        .select(col("doc_id"), col("pos"), col("__nr").as("r"))
        .localCheckpoint()
      k -> cur
    }
  }

  /** Position table (doc_id, pos, rank-after-K-rounds). Exposed for
    * composition; [[dupRunStats]] is the per-doc verdict. */
  def doublingRanks(df: DataFrame, idCol: String, textCol: String,
                    minRun: Int): DataFrame = {
    require(minRun >= 2 && (minRun & (minRun - 1)) == 0,
      s"minRun must be a power of two >= 2 (got $minRun)")
    val rounds = java.lang.Integer.numberOfTrailingZeros(minRun)
    doublingRounds(df, idCol, textCol, rounds).last._2
  }

  /** Per-doc duplicated-run stats at threshold `minRun` (power of
    * two): (doc_id, n_tokens, n_dup_starts). Sentinel positions are
    * excluded from both counts. */
  def dupRunStats(df: DataFrame, idCol: String, textCol: String,
                  minRun: Int = 8): DataFrame = {
    val ranks = doublingRanks(df, idCol, textCol, minRun)
    // doc token counts (sentinel excluded) — keeps empty docs in the
    // report with (0, 0).
    val nTok = df.select(col(idCol).as("doc_id"),
      size(Analyzer.tokenize(coalesce(col(textCol), lit(""))))
        .cast("long").as("n_tokens"))
    val groups = ranks.groupBy(col("r"))
      .agg(count(lit(1)).as("__members"))
      .filter(col("__members") >= 2L)
      .select(col("r"))
    val dupStarts = ranks.join(groups, "r")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("__dups"))
    nTok.join(dupStarts, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("__dups"), lit(0L)).as("n_dup_starts"))
  }

  /** Per-doc LONGEST-duplicated-run profile at power-of-two
    * resolution — the contamination-forensics question ("how LONG is
    * the longest span this doc shares with anything in the corpus?")
    * that a single fixed threshold can't answer: `(doc_id, n_tokens,
    * max_dup_run, n_dup_starts_at_max)` where `max_dup_run` is the
    * largest L ∈ {2, 4, …, maxRun} at which the doc still has a
    * duplicated-run start (0 if none at any threshold) and
    * `n_dup_starts_at_max` counts its starts at that L.
    *
    * One doubling chain serves every threshold: after round k the
    * rank groups ARE the 2^k verdicts, so the per-round extra work is
    * one group-count filter + join-back + per-doc count — the same
    * keyed shapes as [[dupRunStats]], reusing the checkpointed round
    * table instead of re-running the chain per threshold (log₂(L)
    * thresholds for the price of one chain). The final argmax is
    * one `max(struct(run_len, n))` per doc — run lengths are distinct
    * per round, so the lexicographic struct max picks the deepest
    * round and carries its count, the q69 keeper pattern. */
  def dupRunProfile(df: DataFrame, idCol: String, textCol: String,
                    maxRun: Int = 16): DataFrame = {
    require(maxRun >= 2 && (maxRun & (maxRun - 1)) == 0,
      s"maxRun must be a power of two >= 2 (got $maxRun)")
    val rounds = java.lang.Integer.numberOfTrailingZeros(maxRun)
    val perRound = doublingRounds(df, idCol, textCol, rounds)
      .map { case (k, ranks) =>
        val groups = ranks.groupBy(col("r"))
          .agg(count(lit(1)).as("__members"))
          .filter(col("__members") >= 2L)
          .select(col("r"))
        ranks.join(groups, "r")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n"))
          .withColumn("run_len", lit(1L << k))
      }
    val best = perRound.reduce(_ unionByName _)
      .groupBy(col("doc_id"))
      .agg(max(struct(col("run_len"), col("n"))).as("__m"))
    val nTok = df.select(col(idCol).as("doc_id"),
      size(Analyzer.tokenize(coalesce(col(textCol), lit(""))))
        .cast("long").as("n_tokens"))
    nTok.join(best, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("__m.run_len"), lit(0L)).as("max_dup_run"),
        coalesce(col("__m.n"), lit(0L)).as("n_dup_starts_at_max"))
  }
}
