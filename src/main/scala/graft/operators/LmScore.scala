package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Analyzer

/** Corpus-trained n-gram language-model scoring — the CCNet-style
  * quality filter (Wenzek et al. 2020: score each document under a
  * language model and drop/segment the worst tail; KenLM plays the
  * model there). Here the model is a bigram MLE trained ON the corpus
  * being scored, entirely inside the engine — the "train a model over
  * 100 TB, then apply it to the same 100 TB" shape that a pretraining
  * pipeline runs daily. Both deployment shapes are first-class:
  * [[LmScore.bigramScore]] trains and scores the same corpus in one
  * call; [[LmScore.train]] + [[LmScore.bigramScoreWith]] split the
  * phases so a model trained on reference corpus A scores held-out
  * corpus B, with unseen bigrams charged a floor logprob.
  *
  * Model: logprob(w2 | w1) = ln(C(w1 w2) / C(w1 ·)) over corpus bigram
  * counts (MLE; in the self-train shape every scored bigram was
  * counted, so C > 0 by construction and no smoothing is needed — the
  * held-out shape floors misses instead). A document's score is its mean bigram
  * logprob; higher = more typical text, the low tail is boilerplate /
  * noise / wrong-language contamination.
  *
  * Cross-engine determinism: summing raw `ln` doubles across an
  * unordered aggregation is nondeterministic (float addition does not
  * commute), and `ln` itself differs by 1 ulp between StrictMath and
  * glibc on some arguments. Both traps are closed the established way
  * (see q50/q51): each bigram TYPE's logprob is quantized once to an
  * integer micro-nat grid (`floor(ln(p)·1e6 + 0.5)`), and documents
  * sum integers — order-free, overflow-free (|lp_q| ≤ ~30e6, docs
  * have < 2^30 bigrams), and exactly replayable in SQL. The 1e6 grid
  * keeps the per-value boundary-flip probability ≈ ulp/grid ≈ 2e-9
  * (negligible over ~1e5 bigram types), where a nano grid would not.
  *
  * Scale shape (three narrow shuffles, nothing collects):
  *   1. tokenize in the scan → posexplode bigrams → count by
  *      (w1, w2): map-side partial aggregation shrinks the shuffle to
  *      the bigram-TYPE cardinality (vocab-bounded, sublinear in
  *      corpus size);
  *   2. unigram-context counts roll up FROM the bigram table
  *      (C(w1 ·) = Σ_w2 C(w1 w2)) — a second agg over the already-tiny
  *      type table, not a second pass over the corpus;
  *   3. doc bigrams join the scored type table on (w1, w2) — the type
  *      table is vocab-sized, so AQE broadcasts it while it fits and
  *      falls back to a sort-merge join on the same key when a 100 TB
  *      vocab cap pushes it past the threshold — then one groupBy on
  *      the doc id aggregates the integer sum.
  */
object LmScore {

  /** Default out-of-vocabulary penalty: -20 nats in the micro-nat
    * grid (p ≈ 2e-9 — well below any MLE estimate a real corpus
    * produces, so unseen bigrams always score WORSE than seen ones;
    * CCNet's KenLM plays the same card with its <unk> backoff). */
  val DefaultFloorLpQ: Long = -20000000L

  /** Sliding (id, w1, w2) bigram occurrences: zip the token array
    * with its own tail in the scan, THEN explode — one pass, no
    * self-join, no window, and the array never leaves the scan
    * stage. */
  private def slidingBigrams(df: DataFrame, idCol: String,
                             textCol: String): DataFrame = {
    val toks = Analyzer.tokenize(coalesce(col(textCol), lit("")))
    df.select(col(idCol), toks.as("__toks"))
      .select(col(idCol),
        explode(zip_with(
          slice(col("__toks"), lit(1), greatest(size(col("__toks")) - 1, lit(0))),
          slice(col("__toks"), lit(2), greatest(size(col("__toks")) - 1, lit(0))),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("__bg"))
      .select(col(idCol), col("__bg.w1").as("w1"), col("__bg.w2").as("w2"))
  }

  /** Train a bigram MLE on `df` and return the quantized LM table
    * `(w1, w2, lp_q)` — the model artifact. Persist it, hand it to
    * [[bigramScoreWith]], ship it to another corpus: the table IS the
    * model, vocab-sized and engine-portable (integer micro-nats).
    *
    * Shuffle shape: bigram-type counts (map-side partial agg shrinks
    * the shuffle to the TYPE cardinality) + the tiny context rollup —
    * the corpus itself never moves. */
  def train(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val slid = slidingBigrams(df, idCol, textCol)
    val bigramCounts = slid.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c12"))
    val contextCounts = bigramCounts.groupBy(col("w1"))
      .agg(sum(col("c12")).as("c1"))
    bigramCounts.join(contextCounts, "w1")
      .withColumn("lp_q",
        floor(log(col("c12").cast("double") / col("c1").cast("double"))
          * 1000000.0 + 0.5).cast("long"))
      .select(col("w1"), col("w2"), col("lp_q"))
  }

  /** Score `df` under a PRE-TRAINED LM table — the actual CCNet
    * deployment shape (train on reference corpus A, score held-out
    * corpus B). Bigrams absent from the model take `floorLpQ` via a
    * LEFT join, so OOV-heavy junk is PENALIZED, never silently
    * skipped: `n_bigrams` counts every bigram the doc has, `n_oov`
    * how many missed the model, and the sum charges each miss the
    * floor. (An inner join here would drop unseen bigrams from both
    * count and sum — inflating scores for exactly the documents a
    * quality filter exists to catch.)
    *
    * Emits `(idCol, n_bigrams, n_oov, lp_sum_q, avg_lp_q)`; docs with
    * < 2 tokens carry zeros and a 0.0 average (not null — the
    * scored-frame contract in [[Search]]). The model table joins on
    * (w1, w2): AQE broadcasts it while vocab-sized and falls back to
    * a sort-merge join past the threshold. */
  def bigramScoreWith(df: DataFrame, idCol: String, textCol: String,
                      lmTable: DataFrame,
                      floorLpQ: Long = DefaultFloorLpQ): DataFrame = {
    val slid = slidingBigrams(df, idCol, textCol)
    val scored = slid.join(lmTable, Seq("w1", "w2"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_bigrams"),
        sum(when(col("lp_q").isNull, 1L).otherwise(0L)).as("n_oov"),
        sum(coalesce(col("lp_q"), lit(floorLpQ))).as("lp_sum_q"))

    // left join restores short docs (0/1 tokens: no bigrams)
    df.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .withColumn("n_bigrams", coalesce(col("n_bigrams"), lit(0L)))
      .withColumn("n_oov", coalesce(col("n_oov"), lit(0L)))
      .withColumn("lp_sum_q", coalesce(col("lp_sum_q"), lit(0L)))
      .withColumn("avg_lp_q",
        when(col("n_bigrams") === 0, 0.0)
          .otherwise(col("lp_sum_q").cast("double") / col("n_bigrams").cast("double")))
  }

  /** Broadcast-model apply — [[bigramScoreWith]] semantics as ONE
    * scan-local projection: the quantized LM table (the model
    * artifact, vocab-sized BY DESIGN — the same k×dim-class driver
    * collect as [[Similarity.kmeansCentroids]]' centroid table)
    * collects to a map and rides a broadcast variable; each row's
    * (n_bigrams, n_oov, lp_sum_q) comes from a single integer pass
    * over its token array. No joins, no aggregation, no state — the
    * form that drops into an append-mode Structured Streaming chain,
    * where bigramScoreWith's per-doc groupBy would demand
    * watermark-windowed state. Unlike bigramScoreWith it KEEPS the
    * input columns (it is a projection), so cleaning stages chain
    * through it. Integer micro-nat sums are order-free, so the two
    * forms agree bit-for-bit (LmScoreSpec asserts it). */
  def bigramScoreBroadcast(df: DataFrame, textCol: String,
                           lmTable: DataFrame,
                           floorLpQ: Long = DefaultFloorLpQ,
                           maxBroadcastRows: Long = MaxBroadcastModelRows)
      : DataFrame = {
    // the collect below is safe only while the model is vocab-sized;
    // a corpus-derived table past the bound would OOM the driver, so
    // fall back to the join form — same bits (integer micro-nat sums
    // are order-free; the spec asserts parity), different cost shape.
    // ONE materialization guards AND feeds the broadcast: collect
    // limit(max+1) and check the length — a count() first would run a
    // lazily-derived model plan twice (per micro-batch in streaming).
    val probeLimit = math.min(maxBroadcastRows + 1L, Int.MaxValue.toLong).toInt
    val probe = lmTable
      .select(col("w1"), col("w2"), col("lp_q"))
      .limit(probeLimit)
      .collect()
    if (probe.length > maxBroadcastRows)
      return bigramScoreJoinProjection(df, textCol, lmTable, floorLpQ)
    val model: Map[(String, String), Long] =
      probe.map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val bc = df.sparkSession.sparkContext.broadcast(model)
    val scoreUdf = udf { (toks: Seq[String]) =>
      var n = 0L; var oov = 0L; var s = 0L
      var i = 0
      while (i < toks.length - 1) {
        bc.value.get((toks(i), toks(i + 1))) match {
          case Some(v) => s += v
          case None    => oov += 1; s += floorLpQ
        }
        n += 1; i += 1
      }
      (n, oov, s)
    }
    df.withColumn("__sc",
        scoreUdf(Analyzer.tokenize(coalesce(col(textCol), lit("")))))
      .withColumn("n_bigrams", col("__sc._1"))
      .withColumn("n_oov", col("__sc._2"))
      .withColumn("lp_sum_q", col("__sc._3"))
      .withColumn("avg_lp_q",
        when(col("n_bigrams") === 0, 0.0)
          .otherwise(col("lp_sum_q").cast("double") / col("n_bigrams").cast("double")))
      .drop("__sc")
  }

  /** Driver-collect ceiling for [[bigramScoreBroadcast]]'s model map:
    * ~2M entries ≈ a few hundred MB of boxed (w1, w2) → lp_q on the
    * driver — comfortable headroom under a default driver heap, and
    * far above any vocab-sized bigram artifact. Past it the broadcast
    * form silently becomes the join form. */
  val MaxBroadcastModelRows: Long = 2000000L

  /** [[bigramScoreWith]]'s join-form scoring re-shaped to the
    * broadcast form's PROJECTION contract (input columns kept): rows
    * get a transient id, score through the join form keyed on it, and
    * rejoin. The id frame is localCheckpoint'd first —
    * `monotonically_increasing_id` is only stable within one
    * evaluation, and the id appears on both sides of the rejoin. */
  private def bigramScoreJoinProjection(df: DataFrame, textCol: String,
                                        lmTable: DataFrame,
                                        floorLpQ: Long): DataFrame = {
    val rid = df.withColumn("__rid", monotonically_increasing_id())
      .localCheckpoint()
    val scored = bigramScoreWith(rid, "__rid", textCol, lmTable, floorLpQ)
    rid.join(scored, Seq("__rid"))
      .select(df.columns.map(col) ++ Seq(col("n_bigrams"), col("n_oov"),
        col("lp_sum_q"), col("avg_lp_q")): _*)
  }

  /** Per-doc bigram LM score under a model trained ON the scored
    * corpus itself (the self-train shape — every bigram was counted,
    * so C > 0 and the OOV floor never fires; `n_oov` is identically
    * 0 and is dropped to keep the q60 contract). Emits `(idCol,
    * n_bigrams, lp_sum_q, avg_lp_q)`. */
  def bigramScore(df: DataFrame, idCol: String, textCol: String): DataFrame =
    bigramScoreWith(df, idCol, textCol, train(df, idCol, textCol))
      .select(col(idCol), col("n_bigrams"), col("lp_sum_q"), col("avg_lp_q"))

  // ---- interpolated trigram LM (KenLM-grade backoff chain) ------------

  /** The trigram model artifact: three vocab-bounded type tables, each
    * carrying a PRE-INTERPOLATED quantized logprob —
    *   tri  (w1, w2, w3, lp_q):  ln(λ₃·p₃ + λ₂·p₂ + λ₁·p₁)
    *   big  (w2, w3, lp_q):      ln(λ₂·p₂ + λ₁·p₁)   (trigram missed)
    *   uni  (w3, lp_q):          ln(λ₁·p₁)            (bigram missed too)
    * where p₃ = C(w1w2w3)/C(w1w2·), p₂ = C(w2w3)/C(w2·), p₁ = C(w3)/N.
    * Pre-interpolating at TRAIN time keeps apply a pure coalesce
    * chain — no float arithmetic crosses the score join. */
  final case class TrigramModel(tri: DataFrame, big: DataFrame, uni: DataFrame)

  /** Default interpolation weights (λ₃, λ₂, λ₁). Exact decimal
    * literals: both engines parse them to the same IEEE doubles, so
    * the interpolation sum replays bit-for-bit. */
  val DefaultLambdas: (Double, Double, Double) = (0.7, 0.2, 0.1)

  /** Sliding (id, w1, w2, w3) trigram occurrences, same
    * explode-in-scan shape as [[slidingBigrams]]. */
  private def slidingTrigrams(df: DataFrame, idCol: String,
                              textCol: String): DataFrame = {
    val toks = Analyzer.tokenize(coalesce(col(textCol), lit("")))
    df.select(col(idCol), toks.as("__toks"))
      .select(col(idCol),
        explode(when(size(col("__toks")) >= 3,
          transform(sequence(lit(1), size(col("__toks")) - 2),
            i => struct(
              element_at(col("__toks"), i).as("w1"),
              element_at(col("__toks"), i + 1).as("w2"),
              element_at(col("__toks"), i + 2).as("w3"))))
          .otherwise(array())).as("__tg"))
      .select(col(idCol), col("__tg.w1").as("w1"),
        col("__tg.w2").as("w2"), col("__tg.w3").as("w3"))
  }

  /** Train the interpolated trigram MLE (Jelinek–Mercer fixed-weight
    * interpolation — the closed-form heart of CCNet's KenLM filter,
    * minus its Kneser–Ney discounting). Counts come from three
    * map-side-combined type aggregations (trigram, bigram, unigram);
    * denominators roll up FROM the type tables, so the corpus is
    * read once and never shuffled — only types move.
    *
    * Interpolation math is fixed-order double arithmetic
    * (λ₃·p₃ + λ₂·p₂ + λ₁·p₁, left-to-right) on exact integer-count
    * ratios, then one ln quantized to the micro-nat grid — the same
    * cross-engine determinism treatment as [[train]]. */
  def trainTrigram(df: DataFrame, idCol: String, textCol: String,
                   lambdas: (Double, Double, Double) = DefaultLambdas)
      : TrigramModel = {
    val (l3, l2, l1) = lambdas
    val quant = (x: org.apache.spark.sql.Column) =>
      floor(log(x) * 1000000.0 + 0.5).cast("long")

    val uniCounts = df
      .select(explode(Analyzer.tokenize(coalesce(col(textCol), lit("")))).as("w3"))
      .groupBy(col("w3")).agg(count(lit(1)).as("c3"))
    // N as a 1-row frame joined in (a literal would collect; a scalar
    // broadcast-join is the plan-native form)
    val total = uniCounts.agg(sum(col("c3")).as("n_total"))

    val bigCounts = slidingBigrams(df, idCol, textCol)
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val ctx2 = bigCounts.groupBy(col("w1")).agg(sum(col("c12")).as("c2ctx"))
      .withColumnRenamed("w1", "w2")

    val triCounts = slidingTrigrams(df, idCol, textCol)
      .groupBy(col("w1"), col("w2"), col("w3")).agg(count(lit(1)).as("c123"))
    val ctx12 = triCounts.groupBy(col("w1"), col("w2"))
      .agg(sum(col("c123")).as("c12ctx"))

    val p1 = col("c3").cast("double") / col("n_total").cast("double")
    val uni = uniCounts.crossJoin(broadcast(total))
      .withColumn("lp_q", quant(lit(l1) * p1))
      .select(col("w3"), col("lp_q"))

    val p2 = col("c12").cast("double") / col("c2ctx").cast("double")
    val big = bigCounts
      .withColumnRenamed("w1", "w2_").withColumnRenamed("w2", "w3")
      .withColumnRenamed("w2_", "w2")
      .join(ctx2, "w2")
      .join(uniCounts, "w3").crossJoin(broadcast(total))
      .withColumn("lp_q", quant(lit(l2) * p2 + lit(l1) * p1))
      .select(col("w2"), col("w3"), col("lp_q"))

    val p3 = col("c123").cast("double") / col("c12ctx").cast("double")
    val tri = triCounts
      .join(ctx12, Seq("w1", "w2"))
      .join(bigCounts.select(col("w1").as("w2"), col("w2").as("w3"),
        col("c12")), Seq("w2", "w3"))
      .join(ctx2, "w2")
      .join(uniCounts, "w3").crossJoin(broadcast(total))
      .withColumn("lp_q", quant(lit(l3) * p3 + lit(l2) * p2 + lit(l1) * p1))
      .select(col("w1"), col("w2"), col("w3"), col("lp_q"))

    TrigramModel(tri, big, uni)
  }

  /** Score `df` under a pre-trained [[TrigramModel]]: each trigram
    * position takes the FIRST hit in the backoff chain
    * tri(w1,w2,w3) → big(w2,w3) → uni(w3) → `floorLpQ` — three LEFT
    * joins against vocab-bounded type tables (AQE broadcasts them
    * while small, sort-merge past the threshold) and a coalesce; the
    * per-level miss counts are surfaced (`n_tri_hit`, `n_bg_backoff`,
    * `n_ug_backoff`, `n_oov`). Docs with < 3 tokens carry zeros.
    * Integer micro-nat sums keep the aggregation order-free. */
  def trigramScoreWith(df: DataFrame, idCol: String, textCol: String,
                       model: TrigramModel,
                       floorLpQ: Long = DefaultFloorLpQ): DataFrame = {
    val slid = slidingTrigrams(df, idCol, textCol)
    val scored = slid
      .join(model.tri.withColumnRenamed("lp_q", "lp3"),
        Seq("w1", "w2", "w3"), "left")
      .join(model.big.withColumnRenamed("lp_q", "lp2"),
        Seq("w2", "w3"), "left")
      .join(model.uni.withColumnRenamed("lp_q", "lp1"),
        Seq("w3"), "left")
      .withColumn("__lp", coalesce(col("lp3"), col("lp2"), col("lp1"),
        lit(floorLpQ)))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_trigrams"),
        sum(when(col("lp3").isNotNull, 1L).otherwise(0L)).as("n_tri_hit"),
        sum(when(col("lp3").isNull && col("lp2").isNotNull, 1L)
          .otherwise(0L)).as("n_bg_backoff"),
        sum(when(col("lp3").isNull && col("lp2").isNull && col("lp1").isNotNull,
          1L).otherwise(0L)).as("n_ug_backoff"),
        sum(when(col("lp1").isNull && col("lp2").isNull && col("lp3").isNull,
          1L).otherwise(0L)).as("n_oov"),
        sum(col("__lp")).as("lp_sum_q"))
    df.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .na.fill(0L, Seq("n_trigrams", "n_tri_hit", "n_bg_backoff",
        "n_ug_backoff", "n_oov", "lp_sum_q"))
      .withColumn("avg_lp_q",
        when(col("n_trigrams") === 0, 0.0)
          .otherwise(col("lp_sum_q").cast("double") / col("n_trigrams").cast("double")))
  }

  /** Self-train interpolated trigram score (train and score the same
    * corpus; backoff still fires only for trigrams the training pass
    * saw — i.e. never — so this shape exercises the interpolation,
    * not the chain; [[trigramScoreWith]] under a holdout split
    * exercises both). */
  def trigramScore(df: DataFrame, idCol: String, textCol: String): DataFrame =
    trigramScoreWith(df, idCol, textCol, trainTrigram(df, idCol, textCol))

  // ---- CCNet perplexity bucketing (head / middle / tail) ---------------

  /** CCNet's final data-selection step (Wenzek et al. 2020 §3.3):
    * score every document with an LM trained on a CLEAN corpus
    * (their Wikipedia KenLM; here [[trainTrigram]] over the
    * `isClean` slice) and split each LANGUAGE's documents into
    * perplexity terciles — `head` (most Wikipedia-like), `middle`,
    * `tail`. Language comes from the engine's own
    * [[TextAnalysis.withLangId]]; rank order is `avg_lp_q` DESC
    * (highest mean log-prob = lowest perplexity = head) with the doc
    * id as tie-break, so bucket assignment is total and
    * engine-portable: q79 replays the whole chain — training counts,
    * interpolation, backoff, language argmax, ntile — in DuckDB.
    * Docs with no trigrams carry `avg_lp_q = 0.0` and therefore sort
    * into the head of their language — the contract-stated edge (a
    * production funnel drops them at the length gate first).
    *
    * Emits (idCol, lang, n_trigrams, lp_sum_q, avg_lp_q, bucket,
    * bucket_label) for every non-clean doc.
    *
    * Scale note: the ntile window partitions by LANGUAGE — at 100 TB
    * a dominant language (half the web is English) makes that one
    * partition a single-machine sort. This exact-ntile form is the
    * oracle contract; [[perplexityBucketsApprox]] is the scale path
    * (per-language approx boundaries + scan-local comparisons, no
    * window anywhere), the q62/x25 split applied to perplexity. */
  def perplexityBuckets(docs: DataFrame, idCol: String, textCol: String,
                        isClean: Column, buckets: Int = 3): DataFrame = {
    require(buckets >= 2, s"need at least 2 buckets (got $buckets)")
    val flagged = docs.withColumn("__clean", isClean)
    val model = trainTrigram(flagged.filter(col("__clean")), idCol, textCol)
    val rest = flagged.filter(!col("__clean"))
    val scored = trigramScoreWith(rest, idCol, textCol, model)
      .select(col(idCol), col("n_trigrams"), col("lp_sum_q"), col("avg_lp_q"))
    val lang = TextAnalysis.withLangId(rest, textCol)
      .select(col(idCol), col("lang_pred").as("lang"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("avg_lp_q").desc, col(idCol))
    scored.join(lang, Seq(idCol))
      .withColumn("bucket", ntile(buckets).over(w).cast("long"))
      .withColumn("bucket_label",
        when(col("bucket") === 1, "head")
          .when(col("bucket") === buckets, "tail")
          .otherwise("middle"))
  }

  /** [[perplexityBuckets]]' 100 TB shape: ONE aggregation computes
    * per-language approximate perplexity boundaries
    * (`percentile_approx` at 1−i/buckets — a mergeable
    * Greenwald–Khanna sketch, so only sketch partials shuffle), the
    * languages-row boundary table broadcasts, and a scan-local
    * comparison chain assigns buckets. NO window, NO global sort —
    * a dominant language costs nothing extra. Bucket semantics:
    * `bucket = 1 + |{i : avg_lp_q < boundary_i}|`, ties at a
    * boundary land in the better bucket; assignment is a
    * deterministic monotone function of (lang, avg_lp_q), unlike
    * exact ntile which splits ties to even out populations — the
    * accepted approx-curriculum trade (x25 precedent, rows-only by
    * design: sketches are not engine-replayable). */
  /** [[perplexityBucketsApprox]] under DETERMINISTIC sampled-exact
    * per-language boundaries (the [[Boundaries]] discipline applied
    * per group): per language, rank an md5 sample of the scored docs
    * best-first by `avg_lp_q` and take the values at ranks
    * `⌈i·n/buckets⌉` as boundaries; `bucket = 1 + Σ [avg < b_i]`
    * (a doc equal to a boundary keeps the better bucket). All windows
    * are PARTITIONED by language, so groups rank in parallel, and
    * every step — the md5 sample, the rank arithmetic, the double
    * `avg_lp_q` both engines compute identically (the q79 replay) —
    * is SQL-exact: this is the x30 oracle path. The GK form stays
    * available above for corpora where a sketch is preferred. */
  def perplexityBucketsSampled(docs: DataFrame, idCol: String,
                               textCol: String, isClean: Column,
                               buckets: Int = 3,
                               permille: Int = Boundaries.Auto): DataFrame = {
    require(buckets >= 2, s"need at least 2 buckets (got $buckets)")
    val flagged = docs.withColumn("__clean", isClean)
    val model = trainTrigram(flagged.filter(col("__clean")), idCol, textCol)
    val rest = flagged.filter(!col("__clean"))
    val scored = trigramScoreWith(rest, idCol, textCol, model)
      .select(col(idCol), col("n_trigrams"), col("lp_sum_q"), col("avg_lp_q"))
    val lang = TextAnalysis.withLangId(rest, textCol)
      .select(col(idCol), col("lang_pred").as("lang"))
    val base = scored.join(lang, Seq(idCol)).localCheckpoint()
    val pm = Boundaries.effectivePermille(base, permille)
    val samp = base.filter(Sampling.bucketOf(col(idCol)) < pm)
      .select(col("lang"), col("avg_lp_q"))
    val wr = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("avg_lp_q").desc)
    val wn = org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))
    val ranked = samp.withColumn("rn", row_number().over(wr).cast("long"))
      .withColumn("n", count(lit(1)).over(wn))
    val isBoundary = (1 until buckets)
      .map(i => col("rn") === expr(s"(($i * n) + ${buckets - 1}) div $buckets"))
      .reduce(_ || _)
    val bnds = ranked.filter(isBoundary)
      .groupBy(col("lang"))
      .agg(sort_array(collect_list(col("avg_lp_q"))).as("__bs"))
    base.join(broadcast(bnds), Seq("lang"), "left")
      .withColumn("__bs2",
        coalesce(col("__bs"), typedLit(Seq.empty[Double])))
      .withColumn("bucket",
        (lit(1L) + size(filter(col("__bs2"), x => col("avg_lp_q") < x)))
          .cast("long"))
      .withColumn("bucket_label",
        when(col("bucket") === 1, "head")
          .when(col("bucket") === buckets, "tail")
          .otherwise("middle"))
      .select(col(idCol), col("lang"), col("n_trigrams"), col("lp_sum_q"),
        col("avg_lp_q"), col("bucket"), col("bucket_label"))
  }

  def perplexityBucketsApprox(docs: DataFrame, idCol: String, textCol: String,
                              isClean: Column, buckets: Int = 3,
                              accuracy: Int = 10000): DataFrame = {
    require(buckets >= 2, s"need at least 2 buckets (got $buckets)")
    val flagged = docs.withColumn("__clean", isClean)
    val model = trainTrigram(flagged.filter(col("__clean")), idCol, textCol)
    val rest = flagged.filter(!col("__clean"))
    val scored = trigramScoreWith(rest, idCol, textCol, model)
      .select(col(idCol), col("n_trigrams"), col("lp_sum_q"), col("avg_lp_q"))
    val lang = TextAnalysis.withLangId(rest, textCol)
      .select(col(idCol), col("lang_pred").as("lang"))
    val probs = (1 until buckets).map(i => lit(1.0 - i.toDouble / buckets))
    val bnd = scored.join(lang, Seq(idCol))
      .groupBy(col("lang"))
      .agg(percentile_approx(col("avg_lp_q"), array(probs: _*), lit(accuracy))
        .as("__bnd"))
    val bucketExpr = (1 until buckets)
      .map(i => when(col("avg_lp_q") < element_at(col("__bnd"), i), 1L)
        .otherwise(0L))
      .foldLeft(lit(1L))(_ + _)
    scored.join(lang, Seq(idCol))
      .join(broadcast(bnd), Seq("lang"))
      .withColumn("bucket", bucketExpr)
      .withColumn("bucket_label",
        when(col("bucket") === 1, "head")
          .when(col("bucket") === buckets, "tail")
          .otherwise("middle"))
      .select(col(idCol), col("lang"), col("n_trigrams"), col("lp_sum_q"),
        col("avg_lp_q"), col("bucket"), col("bucket_label"))
  }

  // ---- interpolated Kneser–Ney (the CCNet/KenLM reference shape) -------

  /** The KN model artifact — KenLM's ARPA-file structure exactly:
    * PROBABILITY tables per level plus BACKOFF-WEIGHT tables per
    * context, all quantized to the micro-nat grid so apply-time
    * arithmetic is pure integer addition:
    *   tri   (w1, w2, w3, lp_q):  ln p_KN(w3 | w1 w2), seen trigrams
    *   big   (w2, w3, lp_q):      ln p_KN(w3 | w2), seen bigrams
    *   uni   (w3, lp_q):          ln p_cont(w3) = ln(N₁₊(·w3)/N₁₊(··))
    *   ctx12 (w1, w2, b_q):       ln(D·N₁₊(w1w2·)/C(w1w2·))
    *   ctx2  (w2, b_q):           ln(D·N₁₊(w2·)/N₁₊(·w2·))
    * A backoff hop ADDS the context's weight (logs), exactly as a
    * KenLM query walks an ARPA file. */
  final case class KnModel(tri: DataFrame, big: DataFrame, uni: DataFrame,
                           ctx12: DataFrame, ctx2: DataFrame)

  /** The standard absolute-discount constant (Chen & Goodman 1999 use
    * count-of-count estimates; 0.75 is the conventional fixed value).
    * Exactly representable in binary, so both engines compute with
    * the identical IEEE double. */
  val DefaultDiscount: Double = 0.75

  /** Train an interpolated Kneser–Ney trigram LM (Kneser & Ney 1995;
    * Chen & Goodman 1999 §3 — the discounting CCNet's KenLM filter
    * actually uses, completing [[trainTrigram]]'s fixed-weight
    * Jelinek–Mercer):
    *
    *   p(w3|w1w2) = max(C(w1w2w3)−D, 0)/C(w1w2·)
    *                  + (D·N₁₊(w1w2·)/C(w1w2·)) · p(w3|w2)
    *   p(w3|w2)   = max(N₁₊(·w2w3)−D, 0)/N₁₊(·w2·)
    *                  + (D·N₁₊(w2·)/N₁₊(·w2·)) · p_cont(w3)
    *   p_cont(w3) = N₁₊(·w3) / N₁₊(··)
    *
    * — lower levels use CONTINUATION counts (how many distinct
    * contexts a gram follows), not raw frequency: the Kneser–Ney
    * insight that "Francisco" is frequent but predicts badly after
    * anything except "San". Every statistic is an integer count over
    * the trigram/bigram TYPE tables (N₁₊ values are row counts of
    * groupBys), so the whole model replays exactly in SQL: the only
    * float arithmetic is the fixed-order discount expression and one
    * ln, quantized to the micro-nat grid like every LM table here.
    *
    * Degenerate contexts are well-defined, not special-cased away: a
    * bigram (w2, w3) whose middle word never appears inside a trigram
    * (N₁₊(·w2·) = 0 — e.g. 2-token docs) takes p(w3|w2) = p_cont(w3)
    * and a unit backoff weight (ln 1 = 0).
    *
    * Scale shape: the corpus crosses once per n-gram order as
    * map-side-combined TYPE counts; every N₁₊ statistic is a second
    * aggregation OVER a type table (vocab-shaped, never
    * corpus-shaped); model assembly is joins between type tables. */
  def trainTrigramKN(df: DataFrame, idCol: String, textCol: String,
                     discount: Double = DefaultDiscount): KnModel = {
    val quant = (x: org.apache.spark.sql.Column) =>
      floor(log(x) * 1000000.0 + 0.5).cast("long")
    val d = lit(discount)

    val triCounts = slidingTrigrams(df, idCol, textCol)
      .groupBy(col("w1"), col("w2"), col("w3")).agg(count(lit(1)).as("c123"))
      .localCheckpoint()
    val bigCounts = slidingBigrams(df, idCol, textCol)
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
      .localCheckpoint()

    // context statistics — each a row-count/sum over a TYPE table
    val ctx12Stats = triCounts.groupBy(col("w1"), col("w2"))
      .agg(sum(col("c123")).as("c12ctx"),   // C(w1w2·)
        count(lit(1)).as("t12"))            // N₁₊(w1w2·)
    val contBg = triCounts.groupBy(col("w2"), col("w3"))
      .agg(count(lit(1)).as("a2"))          // N₁₊(·w2w3)
    val contMid = contBg.groupBy(col("w2"))
      .agg(sum(col("a2")).as("b2mass"))     // N₁₊(·w2·)
    val followTypes = bigCounts.groupBy(col("w1"))
      .agg(count(lit(1)).as("ft"))          // N₁₊(w2·), keyed as w1
      .withColumnRenamed("w1", "w2")
    val contUni = bigCounts.groupBy(col("w2").as("w3"))
      .agg(count(lit(1)).as("a1"))          // N₁₊(·w3)
    val totalBigramTypes = bigCounts.agg(count(lit(1)).as("nbt")) // N₁₊(··)

    // unigram continuation level (carries raw p1 for reuse upstream)
    val p1Col = col("a1").cast("double") / col("nbt").cast("double")
    val uniP = contUni.crossJoin(broadcast(totalBigramTypes))
      .withColumn("p1", p1Col)
      .select(col("w3"), col("p1"))
      .localCheckpoint()
    val uni = uniP.withColumn("lp_q", quant(col("p1")))
      .select(col("w3"), col("lp_q"))

    // bigram continuation level over ALL seen bigram types: (w2, w3)
    // rows missing from the trigram-derived continuation tables take
    // a2 = 0 (discount clamps to 0) and the degenerate-context branch
    val bigP = bigCounts
      .select(col("w1").as("w2"), col("w2").as("w3"))
      .join(contBg, Seq("w2", "w3"), "left")
      .join(contMid, Seq("w2"), "left")
      .join(followTypes, Seq("w2"))
      .join(uniP, Seq("w3"))
      .withColumn("p2",
        when(col("b2mass").isNull, col("p1"))
          .otherwise(
            greatest(coalesce(col("a2"), lit(0L)).cast("double") - d, lit(0.0))
              / col("b2mass").cast("double")
              + ((d * col("ft").cast("double")) / col("b2mass").cast("double"))
                * col("p1")))
      .select(col("w2"), col("w3"), col("p2"))
      .localCheckpoint()
    val big = bigP.withColumn("lp_q", quant(col("p2")))
      .select(col("w2"), col("w3"), col("lp_q"))

    // trigram level: discounted raw counts + backoff mass × p2
    val tri = triCounts
      .join(ctx12Stats, Seq("w1", "w2"))
      .join(bigP, Seq("w2", "w3"))
      .withColumn("p3",
        greatest(col("c123").cast("double") - d, lit(0.0))
          / col("c12ctx").cast("double")
          + ((d * col("t12").cast("double")) / col("c12ctx").cast("double"))
            * col("p2"))
      .select(col("w1"), col("w2"), col("w3"), quant(col("p3")).as("lp_q"))

    // backoff-weight tables (ln of the redistributed mass per context)
    val ctx12 = ctx12Stats
      .select(col("w1"), col("w2"),
        quant((d * col("t12").cast("double")) / col("c12ctx").cast("double"))
          .as("b_q"))
    val ctx2 = followTypes
      .join(contMid, Seq("w2"), "left")
      .select(col("w2"),
        when(col("b2mass").isNull, lit(0L))
          .otherwise(quant((d * col("ft").cast("double"))
            / col("b2mass").cast("double"))).as("b_q"))

    KnModel(tri, big, uni, ctx12, ctx2)
  }

  /** Score `df` under a [[KnModel]], walking the chain the way a
    * KenLM query walks an ARPA file: a seen trigram reads its lp
    * directly; a miss backs off to the bigram entry PLUS the (w1,w2)
    * context's backoff weight; a double miss adds the (w2) weight and
    * reads the continuation unigram; full OOV takes the floor. All
    * additions are quantized integers — order-free, SQL-replayable.
    * Unseen contexts contribute weight ln(1) = 0 (nothing to
    * redistribute). Emits the [[trigramScoreWith]] schema. */
  def knScoreWith(df: DataFrame, idCol: String, textCol: String,
                  model: KnModel,
                  floorLpQ: Long = DefaultFloorLpQ): DataFrame = {
    val slid = slidingTrigrams(df, idCol, textCol)
    val scored = slid
      .join(model.tri.withColumnRenamed("lp_q", "lp3"),
        Seq("w1", "w2", "w3"), "left")
      .join(model.big.withColumnRenamed("lp_q", "lp2"),
        Seq("w2", "w3"), "left")
      .join(model.uni.withColumnRenamed("lp_q", "lp1"),
        Seq("w3"), "left")
      .join(model.ctx12.withColumnRenamed("b_q", "b12"),
        Seq("w1", "w2"), "left")
      .join(model.ctx2.withColumnRenamed("b_q", "b2"),
        Seq("w2"), "left")
      .withColumn("__lp",
        when(col("lp3").isNotNull, col("lp3"))
          .when(col("lp2").isNotNull, coalesce(col("b12"), lit(0L)) + col("lp2"))
          .when(col("lp1").isNotNull,
            coalesce(col("b12"), lit(0L)) + coalesce(col("b2"), lit(0L))
              + col("lp1"))
          .otherwise(lit(floorLpQ)))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_trigrams"),
        sum(when(col("lp3").isNotNull, 1L).otherwise(0L)).as("n_tri_hit"),
        sum(when(col("lp3").isNull && col("lp2").isNotNull, 1L)
          .otherwise(0L)).as("n_bg_backoff"),
        sum(when(col("lp3").isNull && col("lp2").isNull && col("lp1").isNotNull,
          1L).otherwise(0L)).as("n_ug_backoff"),
        sum(when(col("lp1").isNull && col("lp2").isNull && col("lp3").isNull,
          1L).otherwise(0L)).as("n_oov"),
        sum(col("__lp")).as("lp_sum_q"))
    df.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .na.fill(0L, Seq("n_trigrams", "n_tri_hit", "n_bg_backoff",
        "n_ug_backoff", "n_oov", "lp_sum_q"))
      .withColumn("avg_lp_q",
        when(col("n_trigrams") === 0, 0.0)
          .otherwise(col("lp_sum_q").cast("double") / col("n_trigrams").cast("double")))
  }
}
