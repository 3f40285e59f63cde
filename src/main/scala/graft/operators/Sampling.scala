package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling for training-data
  * pipelines. RNG-based `sample()` is irreproducible across engines,
  * partitionings and reruns; hashing a stable id into buckets gives
  * splits that are (a) exactly reproducible anywhere md5 exists,
  * (b) stable under repartitioning/scale-up, and (c) disjoint by
  * construction — the standard train/test-split discipline at corpus
  * scale. Selectivity is uniform because md5 is; the modulus bounds
  * the granularity (1/1000 here).
  */
object Sampling {

  private val Buckets = 1000

  /** Stable bucket in [0, 1000) from the row's id. */
  def bucketOf(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 6), 16, 10).cast("long") % Buckets

  /** Keep ~`permille`/1000 of rows, deterministically by id. */
  def samplePermille(df: DataFrame, idCol: String, permille: Int): DataFrame =
    df.filter(bucketOf(col(idCol)) < permille)

  /** Disjoint deterministic split: (train, heldOut) where heldOut is
    * ~`heldOutPermille`/1000 of rows. Union = input; intersection = ∅. */
  def split(df: DataFrame, idCol: String, heldOutPermille: Int): (DataFrame, DataFrame) =
    (df.filter(bucketOf(col(idCol)) >= heldOutPermille),
     df.filter(bucketOf(col(idCol)) < heldOutPermille))

  /** Per-stratum deterministic rates: keep rows whose bucket falls
    * under their stratum's permille (unlisted strata drop). */
  def stratified(df: DataFrame, idCol: String, stratumCol: String,
                 permilleByStratum: Map[String, Int]): DataFrame = {
    val rate = permilleByStratum.foldLeft(lit(0)) { case (acc, (k, v)) =>
      when(col(stratumCol) === k, lit(v)).otherwise(acc)
    }
    df.filter(bucketOf(col(idCol)) < rate)
  }

  /** Epoch-aware deterministic upsampling — the mixing step that
    * repeats under-represented strata (a curated source run for 2.6
    * epochs while web data runs once). Factors are permille: 2600 =
    * 2.6 epochs. Each row emits floor(factor) full copies plus one
    * more iff hash(id, epoch) falls under the fractional part — no
    * RNG, so the result is bit-reproducible across engines, reruns
    * and repartitionings, and each doc's "extra" copy is an
    * independent coin rather than a corpus-wide stripe. Unlisted
    * strata drop (factor 0).
    *
    * Emits `epoch` (0-based copy index) and `shuffle_key` =
    * md5(id:epoch), so downstream training order is "sort by
    * shuffle_key" — a rangepartitioned sort at scale that scatters a
    * doc's repeats across the whole order instead of leaving them
    * adjacent.
    *
    * Scale shape: the row multiplication is an explode of a ≤
    * ⌈factor⌉-element sequence in the scan projection — zero
    * shuffles, zero joins; output size is exactly the token budget
    * the mixture calls for. */
  def upsample(df: DataFrame, idCol: String, stratumCol: String,
               factorPermilleByStratum: Map[String, Int]): DataFrame = {
    require(factorPermilleByStratum.values.forall(_ >= 0),
      "upsample factors must be >= 0 permille")
    val factor = factorPermilleByStratum.foldLeft(lit(0)) {
      case (acc, (k, v)) => when(col(stratumCol) === k, lit(v)).otherwise(acc)
    }
    val full = floor(factor.cast("double") / 1000.0).cast("int")
    val fracPermille = factor % 1000
    df.withColumn("epoch", explode(sequence(lit(0), full)))
      .withColumn("epoch", col("epoch").cast("long"))
      .withColumn("__key",
        concat(col(idCol).cast("string"), lit(":"), col("epoch").cast("string")))
      .filter(col("epoch") < full || bucketOf(col("__key")) < fracPermille)
      .withColumn("shuffle_key", md5(col("__key")))
      .drop("__key")
  }

  /** Temperature-flattened mixture (the multinomial α-reweighting of
    * GPT-3 §2.2 / XLM-R: sample domain g with probability ∝ n_g^α,
    * α < 1 flattening the size distribution so big domains stop
    * drowning small ones). Normalized so the LARGEST group keeps
    * weight 1.0 — every group's target count t_g = n_g^α·n_max^(1-α)
    * ≥ n_g, realized as ⌊t_g/n_g⌋ full copies per doc plus one extra
    * iff the doc's md5 bucket falls under the fractional remainder —
    * [[upsample]]'s deterministic-coin recipe, with the factors
    * DERIVED from corpus statistics instead of hand-fed.
    *
    * Engine-portable BY CONSTRUCTION at α = 0.5 (the common "square
    * root temperature"): t_g = ⌊√(n_g·n_max) + 0.5⌋ is one IEEE
    * (correctly-rounded, so cross-engine-identical) sqrt of an exact
    * integer product, copy counts are integer div/mod, and the
    * fractional coin compares exact decimal products — the whole
    * plan replays in SQL (q65). Other α use `pow` (same shape, no
    * oracle guarantee — pow is not correctly rounded).
    *
    * Emits one row per kept COPY: the input row + `copy` (0-based) +
    * `n_group`/`target` for mixture dashboards.
    *
    * Scale shape: one group-count aggregate (rows = number of
    * domains) broadcasts back; the copy expansion is a scan-local
    * sequence-explode. Zero corpus-sized shuffles. */
  def temperatureMix(df: DataFrame, idCol: String, groupCol: String,
                     alpha: Double = 0.5): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0, 1] (got $alpha)")
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("n_group"))
    val nmax = counts.agg(max(col("n_group")).as("__nmax"))
    val weight =
      if (alpha == 0.5) sqrt((col("n_group") * col("__nmax")).cast("double"))
      else pow(col("n_group").cast("double"), alpha) *
        pow(col("__nmax").cast("double"), 1.0 - alpha)
    val targets = counts.crossJoin(broadcast(nmax))
      .withColumn("target", floor(weight + lit(0.5)).cast("long"))
      .select(col(groupCol), col("n_group"), col("target"))
      .localCheckpoint() // broadcast of a live subtree re-runs it per exchange
    val bucket24 = conv(substring(md5(col(idCol).cast("string")), 1, 6), 16, 10)
      .cast("long")
    df.join(broadcast(targets), Seq(groupCol))
      .withColumn("__base", expr("target div n_group"))
      .withColumn("__rem", col("target") - col("__base") * col("n_group"))
      .withColumn("__extra",
        when(bucket24.cast("decimal(19,0)") * col("n_group").cast("decimal(19,0)") <
          col("__rem").cast("decimal(19,0)") * lit(16777216L).cast("decimal(19,0)"),
          1L).otherwise(0L))
      .withColumn("copy",
        explode(sequence(lit(0L), col("__base") + col("__extra") - 1)))
      .drop("__base", "__rem", "__extra")
  }

  /** Per-group document cap — the domain-balancing step of web-corpus
    * pipelines (e.g. C4 / RefinedWeb keep at most N pages per host so
    * boilerplate-heavy domains can't dominate the mix). Keeps the top
    * `n` rows of each group under (orderCol desc, tiebreak asc) —
    * fully deterministic — and emits the 1-based `rank` kept.
    *
    * Scale shape: one shuffle on the group key, then a per-group sort
    * inside each partition (window rank + filter; sort spills, nothing
    * collects). A skewed mega-domain serializes into one task ONLY for
    * its own group — with AQE skew splitting unavailable for windows,
    * the escape hatch at 100 TB is a pre-pass partial top-n per
    * partition (groupBy + slice(array_sort(collect_list))) feeding the
    * same window, which bounds any task at partitions·n rows. That
    * pre-pass is cap-dependent, so it stays opt-in rather than default. */
  def capPerGroup(df: DataFrame, groupCol: String, orderCol: String,
                  tiebreak: String, n: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(col(orderCol).desc, col(tiebreak))
    df.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= n)
  }

  /** Skew-safe [[capPerGroup]]: a partial top-n per (input-partition,
    * group) runs first, so the final per-group window receives at most
    * `partitions·n` rows for ANY group — a mega-domain that holds half
    * the corpus contributes n rows per scan partition instead of
    * serializing its entire membership into one window task. The
    * global top-n of a group is always contained in the union of its
    * per-partition top-ns, so results are identical (equivalence is
    * spec-tested). Costs one extra skew-FREE exchange on
    * (partition-id, group); worth it only when a group can exceed an
    * executor's sort budget — which is why it's a separate entry
    * point, not the default.
    *
    * REQUIRES `(orderCol, tiebreak)` to be a total order within each
    * group (in practice: `tiebreak` is a unique key, like `doc_id`).
    * With ties, both entry points keep SOME n rows with the same
    * `(orderCol, tiebreak)` prefix, but which tied row survives can
    * differ: the per-partition pre-pass ranks within a
    * nondeterministic `spark_partition_id` slice, so a tie broken one
    * way there may be broken the other way by the single global
    * window. The equivalence spec covers the unique-tiebreak case
    * only — with a non-unique tiebreak this function is still a
    * correct top-n-per-group, just not row-identical to
    * [[capPerGroup]]. */
  def capPerGroupSkewSafe(df: DataFrame, groupCol: String, orderCol: String,
                          tiebreak: String, n: Int): DataFrame = {
    val w1 = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__pid"), col(groupCol))
      .orderBy(col(orderCol).desc, col(tiebreak))
    val survivors = df.withColumn("__pid", spark_partition_id())
      .withColumn("__r", row_number().over(w1))
      .filter(col("__r") <= n)
      .drop("__r", "__pid")
    capPerGroup(survivors, groupCol, orderCol, tiebreak, n)
  }

  // ---- DSIR importance resampling (Xie et al. 2023) --------------------

  /** Per-doc hashed n-gram feature occurrences, pre-counted in one
    * scan-local pass: unigrams + bigrams of the analyzer tokens, each
    * hashed into `buckets` via the engine's replayable 64-bit rolling
    * hash ([[TextAnalysis.rollingHashOf]] — the x08 fingerprint
    * recurrence, so a DuckDB oracle reproduces every bucket id with
    * HUGEINT wrapping arithmetic). Emits (idCol, bucket, cnt). */
  private def hashedNgramFeatures(df: DataFrame, idCol: String,
                                  textCol: String, buckets: Int): DataFrame = {
    val featUdf = udf { (toks: Seq[String]) =>
      val m = scala.collection.mutable.LongMap.empty[Long]
      def add(s: String): Unit = {
        val b = ((TextAnalysis.rollingHashOf(s) % buckets) + buckets) % buckets
        m(b) = m.getOrElse(b, 0L) + 1L
      }
      toks.foreach(add)
      var i = 0
      while (i < toks.length - 1) { add(toks(i) + " " + toks(i + 1)); i += 1 }
      m.toSeq.map { case (b, c) => (b.toInt, c) }
    }
    df.select(col(idCol),
        featUdf(graft.functions.Analyzer.tokenize(
          coalesce(col(textCol), lit("")))).as("fs"))
      .select(col(idCol), explode(col("fs")).as("f"))
      .select(col(idCol), col("f._1").as("bucket"), col("f._2").as("cnt"))
  }

  /** DSIR importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every raw doc
    * by how much it looks like the TARGET distribution, under two
    * bag-of-hashed-ngrams models — log w(x) = Σ_f c_f(x)·(ln p̂[f] −
    * ln q̂[f]), with p̂/q̂ the add-half-smoothed bucket frequencies of
    * the target/raw corpora. The log-ratio of each BUCKET quantizes
    * once to the micro-nat grid (the LM-table treatment, q60/q70), so
    * per-doc weights are order-free integer sums and the whole
    * computation replays exactly in SQL (q76).
    *
    * Scale shape: feature extraction is scan-local (one UDF pass per
    * row, pre-counted per doc); the ONLY corpus-driven shuffles are
    * the two bucket-count aggregates, each map-side-combined down to
    * ≤ `buckets` rows; the log-ratio table is `buckets` rows and
    * broadcasts into the scoring join; per-doc weights are one
    * id-keyed aggregate. The raw corpus is read twice (q̂ counts,
    * scoring) — by design, instead of materializing a corpus-sized
    * feature table.
    *
    * Emits one row per raw doc: (idCol, n_feats, logw_q, avg_lw_q);
    * docs with no tokens carry zeros. Rank/threshold on the output
    * (e.g. [[capPerGroup]] or a top-k) to select; the paper's
    * Gumbel-noise sampling is deliberately replaced by deterministic
    * ranking — reproducibility is this engine's selection contract. */
  def dsirWeights(raw: DataFrame, target: DataFrame, idCol: String,
                  textCol: String, buckets: Int = 4096): DataFrame = {
    require(buckets >= 2 && (buckets & (buckets - 1)) == 0,
      s"buckets must be a power of two >= 2 (got $buckets)")
    val half = buckets / 2.0 // exact double: buckets is a power of two
    val fr = hashedNgramFeatures(raw, idCol, textCol, buckets)
    val cq = fr.groupBy(col("bucket")).agg(sum(col("cnt")).as("cq"))
    val cp = hashedNgramFeatures(target, idCol, textCol, buckets)
      .groupBy(col("bucket")).agg(sum(col("cnt")).as("cp"))
    val nq = cq.agg(sum(col("cq")).as("nq"))
    val np = cp.agg(sum(col("cp")).as("np"))
    val lr = cq.join(cp, Seq("bucket"), "full_outer")
      .na.fill(0L, Seq("cq", "cp"))
      .crossJoin(broadcast(np)).crossJoin(broadcast(nq))
      .withColumn("lr_q",
        floor((log((col("cp").cast("double") + 0.5)
            / (col("np").cast("double") + half))
          - log((col("cq").cast("double") + 0.5)
            / (col("nq").cast("double") + half))) * 1000000.0 + 0.5)
          .cast("long"))
      .select(col("bucket"), col("lr_q"))
      .localCheckpoint() // model artifact: ≤ buckets rows, broadcast below
    val scored = fr.join(broadcast(lr), Seq("bucket"))
      .groupBy(col(idCol))
      .agg(sum(col("cnt")).as("n_feats"),
        sum(col("cnt") * col("lr_q")).as("logw_q"))
    raw.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .na.fill(0L, Seq("n_feats", "logw_q"))
      .withColumn("avg_lw_q",
        when(col("n_feats") === 0, 0.0)
          .otherwise(col("logw_q").cast("double") / col("n_feats").cast("double")))
  }

  /** Deterministic DSIR selection: the `k` raw docs most
    * target-like by per-feature average weight (length-debiased;
    * ties → smaller id). TakeOrderedAndProject over the weight
    * output — never a global sort of the corpus. */
  def dsirSelect(raw: DataFrame, target: DataFrame, idCol: String,
                 textCol: String, k: Int, buckets: Int = 4096): DataFrame =
    dsirWeights(raw, target, idCol, textCol, buckets)
      .orderBy(col("avg_lw_q").desc, col(idCol))
      .limit(k)

  /** Deterministic TRAINING-ORDER schedule — stride scheduling
    * (Waldspurger & Weihl 1995, the lottery/stride CPU scheduler
    * applied to data mixing): a reproducible interleaving of weighted
    * sources where any prefix of the emitted order holds each source
    * in proportion to its weight (within one item) — the property a
    * resumable training run needs from its data order, and what
    * "shuffle then hope" does not give. Item r (1-based, ordered by
    * `idCol` within its source) is emitted at virtual time
    * `(2r−1)/(2w)` — one double division of exact integers, identical
    * IEEE result in any engine, so the schedule hash-replays. The
    * first `k` positions come off a TakeOrderedAndProject (never a
    * global sort); the rank window then runs over k rows. */
  def strideSchedule(df: DataFrame, groupCol: String, idCol: String,
                     weightOf: Column, k: Int): DataFrame = {
    val byGroup = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col(idCol))
    val keyed = df
      .withColumn("__w", weightOf.cast("long"))
      .withColumn("__r", row_number().over(byGroup).cast("long"))
      .withColumn("__vt",
        (lit(2L) * col("__r") - lit(1L)).cast("double")
          / (lit(2L) * col("__w")).cast("double"))
    val topK = keyed
      .orderBy(col("__vt"), col(groupCol), col("__r"))
      .limit(k)
    topK.withColumn("pos", row_number()
        .over(org.apache.spark.sql.expressions.Window
          .orderBy(col("__vt"), col(groupCol), col("__r"))).cast("long"))
      .select(col("pos"), col(groupCol), col(idCol))
  }

  /** EXACT stratified allocation — largest-remainder (Hamilton)
    * apportionment: how many docs each stratum contributes to an
    * exactly-`target`-sized dataset. Base share = floor(target·N_g/N);
    * the leftover seats go to the largest remainders (ties → smaller
    * stratum key). Pure integer arithmetic (target·N_g stays far
    * under 2^63 for any real corpus), Σ n_alloc = target EXACTLY —
    * the property proportional rounding loses.
    * Returns `(key, n_rows, n_alloc)`. */
  def hamiltonAllocate(df: DataFrame, groupCol: String,
                       target: Long): DataFrame = {
    val counts = df.groupBy(col(groupCol).as("key"))
      .agg(count(lit(1)).as("n_rows"))
    val tot = counts.agg(sum(col("n_rows")).as("__n"))
    val quotas = counts.crossJoin(broadcast(tot))
      .withColumn("__num", lit(target) * col("n_rows"))
      .withColumn("__base", expr("__num div __n")) // integral: `/` is double
      .withColumn("__rem", col("__num") % col("__n"))
    val byRem = org.apache.spark.sql.expressions.Window
      .orderBy(col("__rem").desc, col("key"))
    val deficit = quotas.agg((lit(target) - sum(col("__base")))
      .as("__extra"))
    quotas.crossJoin(broadcast(deficit))
      .withColumn("__rk", row_number().over(byRem).cast("long"))
      .withColumn("n_alloc",
        col("__base") + when(col("__rk") <= col("__extra"), 1L).otherwise(0L))
      .select(col("key"), col("n_rows"), col("n_alloc"))
  }

  /** The allocation applied: exactly `target` rows, each stratum
    * contributing its Hamilton share, members chosen by md5-hash
    * order within the stratum (deterministic uniform — the
    * [[bucketOf]] split family's ordering). */
  def stratifiedExact(df: DataFrame, groupCol: String, idCol: String,
                      target: Long): DataFrame = {
    val alloc = hamiltonAllocate(df, groupCol, target)
      .select(col("key").as(groupCol), col("n_alloc"))
    val byHash = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("__rk", row_number().over(byHash).cast("long"))
      .join(alloc, Seq(groupCol))
      .filter(col("__rk") <= col("n_alloc"))
      .select(col(idCol), col(groupCol), col("__rk").as("pick_rank"))
  }

  /** Deterministic corpus shuffle — reproducible TRAINING ORDER: rank
    * every row by `md5("<seed>:<id>")` (this module's engine-portable
    * mixer — the [[bucketOf]]/[[stratifiedExact]] discipline; NOT the
    * wrapping base-31 fold, which is ORDER-PRESERVING on decimal id
    * strings below its overflow point and would return the identity
    * permutation), hash ties broken by id. A different seed is a
    * different, equally uniform order — the epoch-reshuffle lever.
    *
    * Scale shape: ONE distributed range-sort + zipWithIndex — never a
    * single-partition global window (the q48 lesson: a global
    * `row_number() OVER (ORDER BY ...)` serializes the corpus onto
    * one task; the sort + per-partition index is the same answer at
    * full parallelism). Output `(idCol, h, shuffle_rank)` with ranks
    * 1..n in hash order. */
  def deterministicShuffle(df: DataFrame, idCol: String,
                           seed: Long): DataFrame = {
    val keyed = df.select(col(idCol),
      md5(concat(lit(seed.toString), lit(":"), col(idCol).cast("string")))
        .as("h"))
    val sorted = keyed.orderBy(col("h"), col(idCol))
    val schema = sorted.schema
      .add("shuffle_rank", org.apache.spark.sql.types.LongType,
        nullable = false)
    df.sparkSession.createDataFrame(
      sorted.rdd.zipWithIndex().map { case (r, i) =>
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ (i + 1L))
      }, schema)
  }

  /** Per-group token budget — "at most N tokens per domain": within
    * each group, keep the `(priority DESC, id)`-prefix whose running
    * token total fits `budgetPerGroup` (the token-denominated sibling
    * of [[capPerGroup]]'s row caps — caps in rows under-weigh long
    * docs). A PARTITIONED window, so groups cumsum in parallel; the
    * skew ceiling is the largest single group, the usual per-key
    * window story. Output `(idCol, groupCol, n_tok, cum_tok)`. */
  def tokenBudgetPerGroup(df: DataFrame, idCol: String, textCol: String,
                          groupCol: String, priority: Column,
                          budgetPerGroup: Long): DataFrame = {
    require(budgetPerGroup >= 0,
      s"budget must be >= 0 (got $budgetPerGroup)")
    // the window orders by the INTERNAL alias — the caller's column
    // expression is no longer resolvable after the projection
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("__p").desc, col(idCol))
    // null text = zero tokens, explicitly — matches SUM-ignores-NULL
    // cumsum semantics without flowing a null n_tok downstream
    df.select(col(idCol), col(groupCol), priority.as("__p"),
        coalesce(TextStats.wordCount(col(textCol)).cast("long"), lit(0L))
          .as("n_tok"))
      .withColumn("cum_tok", sum(col("n_tok")).over(w))
      .filter(col("cum_tok") <= budgetPerGroup)
      .select(col(idCol), col(groupCol), col("n_tok"), col("cum_tok"))
  }

  /** Token-budget selection — fill an N-token training budget by
    * priority: sort by `(priority DESC, id)`, take docs while the
    * RUNNING token total stays ≤ `budgetTokens` (a doc that would
    * cross the line is dropped, as is everything after it; tokens are
    * [[TextStats.wordCount]]'s whitespace count, the q48 grid).
    * Output `(idCol, n_tok, cum_tok)` for the kept prefix.
    *
    * Scale shape: the exact global cumsum WITHOUT a one-partition
    * window — one range-sort by priority, per-partition token sums
    * (one row per partition) compose prefix offsets on the driver,
    * then a second pass over the cached sort emits running totals
    * in-partition (the denseRankInPlace offset discipline). Early
    * partitions past the budget are skipped entirely (their offset
    * already exceeds it). */
  def tokenBudgetSelect(df: DataFrame, idCol: String, textCol: String,
                        priority: Column, budgetTokens: Long): DataFrame = {
    require(budgetTokens >= 0, s"budget must be >= 0 (got $budgetTokens)")
    val spark = df.sparkSession
    // null text = zero tokens, explicitly — the RDD pass below reads
    // n_tok with getLong, which must never see a null cell
    val base = df.select(col(idCol), priority.as("__p"),
      coalesce(TextStats.wordCount(col(textCol)).cast("long"), lit(0L))
        .as("n_tok"))
    val sorted = base.orderBy(col("__p").desc, col(idCol))
    sorted.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val nTokIdx = sorted.schema.fieldIndex("n_tok")
      val perPart = sorted.rdd.mapPartitionsWithIndex { (p, it) =>
        var s = 0L; it.foreach(r => s += r.getLong(nTokIdx))
        Iterator((p, s))
      }.collect().sortBy(_._1)
      val offsets = perPart.scanLeft(0L)(_ + _._2).init
      val offByPart = perPart.map(_._1).zip(offsets).toMap
      val budget = budgetTokens
      val schema = org.apache.spark.sql.types.StructType(
        sorted.schema.fields :+
          org.apache.spark.sql.types.StructField("cum_tok",
            org.apache.spark.sql.types.LongType, nullable = false))
      val kept = sorted.rdd.mapPartitionsWithIndex { (p, it) =>
        var run = offByPart(p)
        if (run > budget) Iterator.empty
        else it.flatMap { r =>
          // running total is monotone (n_tok >= 0), so the first
          // crossing ends the kept prefix; later rows just skip
          run += r.getLong(nTokIdx)
          if (run <= budget)
            Some(org.apache.spark.sql.Row.fromSeq(r.toSeq :+ run))
          else None
        }
      }
      spark.createDataFrame(kept, schema)
        .select(col(idCol), col("n_tok"), col("cum_tok"))
        .localCheckpoint()
    } finally sorted.unpersist(blocking = false)
  }
}
