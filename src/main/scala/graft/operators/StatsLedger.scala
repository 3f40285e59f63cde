package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental maintenance of algebraic aggregates — the materialized-
  * view side of the funnel's incremental story (x28/x35 grow dedup
  * state and the ANN layout without rebuilds; this grows the CORPUS
  * CARD without rescans).
  *
  * At 100 TB the per-source statistics behind a corpus card (doc
  * counts, char totals, min/max lengths, second moments for variance)
  * are a full-corpus aggregation — repeating it after every ingest
  * batch re-reads everything ever ingested. But these aggregates are
  * ALGEBRAIC (Gray et al. 1997, the data-cube taxonomy): each admits a
  * constant-size partial state that merges associatively and
  * commutatively —
  *   count → sum of counts      sum  → sum of sums
  *   min   → min of mins        max  → max of maxes
  *   sumsq → sum of sumsqs  (variance = (sumsq − sum²/n)/n at read)
  * so the standing card folds in a delta batch by aggregating ONLY the
  * delta (one map-side-combined shuffle over delta rows, standing
  * ledger read is key-cardinality-sized) and merging ledgers. The
  * result is BIT-IDENTICAL to a full recompute when the value column
  * is integral — long addition is exact and order-free — which is what
  * lets the q103 oracle check the fold against a full-data GROUP BY.
  *
  * Distributive/holistic aggregates are deliberately NOT here: exact
  * distinct is not mergeable in constant space (the HLL register
  * ledger in [[Sketch]] is the bounded-state answer), and medians are
  * not mergeable at all (q39's percentile_approx sketch is the scan-
  * time answer).
  */
object StatsLedger {

  /** Ledger schema: `(key, n, sum, min, max, sumsq)`, all-LONG partial
    * aggregates of `valCol` grouped by `keyCol`.
    *
    * Overflow headroom (Spark LONG sums wrap silently, unlike the
    * DuckDB oracle's HUGEINT which would error): the binding term is
    * `sumsq`, safe while per-key `n · max(v)²  <  2^63 ≈ 9.2e18`. For
    * the doc-length cards this ledger backs (`v` = n_chars, docs
    * capped at ~1e6 chars → squares ≤ 1e12) that bounds a key at
    * ~9e6 billion-char docs — but an UNCAPPED length column at the
    * advertised 1e12-doc scale can exceed it. Callers owning longer
    * values must pre-cap `valCol` (the funnel's truncate stage
    * already bounds n_chars) or move the sumsq leg to
    * `DecimalType(38,0)` at ~2× agg cost; `sum` is safe far beyond
    * (`n · max(v) < 2^63` → 9e12 docs of 1e6 chars). */
  def partial(df: DataFrame, keyCol: String, valCol: String): DataFrame = {
    val v = col(valCol).cast("long")
    df.groupBy(col(keyCol).as("key")).agg(
      count(lit(1)).as("n"),
      sum(v).as("sum"),
      min(v).as("min"),
      max(v).as("max"),
      sum(v * v).as("sumsq"))
  }

  /** Merge two ledgers (associative + commutative — any fold order,
    * any slice boundary, same bits). */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("key")).agg(
      sum(col("n")).as("n"),
      sum(col("sum")).as("sum"),
      min(col("min")).as("min"),
      max(col("max")).as("max"),
      sum(col("sumsq")).as("sumsq"))

  /** Fold a delta batch into a standing ledger. */
  def foldIn(standing: DataFrame, delta: DataFrame,
             keyCol: String, valCol: String): DataFrame =
    merge(standing, partial(delta, keyCol, valCol))

  /** Collapse a pile of partial rows (e.g. many per-batch partials
    * read back from an append-only ledger dir) into one ledger —
    * `merge`'s aggregation without the union. */
  def fold(partials: DataFrame): DataFrame =
    partials.groupBy(col("key")).agg(
      sum(col("n")).as("n"),
      sum(col("sum")).as("sum"),
      min(col("min")).as("min"),
      max(col("max")).as("max"),
      sum(col("sumsq")).as("sumsq"))

  /** Empty ledger with the right schema (the `readStateOr` fallback —
    * must stay semantically empty, see Dedup.readStateOr's contract). */
  def empty(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(String, Long, Long, Long, Long, Long)]
      .toDF("key", "n", "sum", "min", "max", "sumsq")
  }

  // ---- log2-binned histogram ledger ---------------------------------
  // The quantile counterpart to the moment ledger above: exact
  // medians/percentiles are HOLISTIC (not mergeable in constant
  // space), but a log2-binned histogram is ALGEBRAIC — per-bin counts
  // sum-merge — and answers "which power-of-two length band holds the
  // p-th percentile" exactly and deterministically, with relative
  // value resolution 2× (plenty for length-distribution corpus cards
  // and curriculum cut points). Bin = bit-length of the value
  // (floor(log2 v)+1, v ≤ 0 → bin 0), computed via length(bin(v)) so
  // the DuckDB oracle replays it verbatim — the same bit-length trick
  // the HLL rho uses.

  /** Histogram ledger `(key, bin, cnt)` for `valCol` grouped by
    * `keyCol`. */
  def histPartial(df: DataFrame, keyCol: String, valCol: String): DataFrame =
    df.select(col(keyCol).as("key"), col(valCol).cast("long").as("v"))
      .select(col("key"),
        when(col("v") <= 0L, lit(0L))
          .otherwise(length(bin(col("v"))).cast("long")).as("bin"))
      .groupBy(col("key"), col("bin")).agg(count(lit(1)).as("cnt"))

  /** Sum-merge two histogram ledgers. */
  def histMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("key"), col("bin"))
      .agg(sum(col("cnt")).as("cnt"))

  /** Collapse many histogram partial rows into one ledger. */
  def histFold(partials: DataFrame): DataFrame =
    partials.groupBy(col("key"), col("bin")).agg(sum(col("cnt")).as("cnt"))

  /** Read-time percentile bands from a histogram ledger: for each
    * requested percentile p, the smallest bin whose cumulative count
    * reaches p% of the key's total, with the bin's exact value range
    * `[lo, hi]`. Integer arithmetic throughout (`cum·100 ≥ p·total`),
    * so the answer is order-free and oracle-replayable. */
  def histPercentiles(hist: DataFrame, percentiles: Seq[Int]): DataFrame = {
    val sp = hist.sparkSession
    import sp.implicits._
    val byBin = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key")).orderBy(col("bin"))
    val whole = org.apache.spark.sql.expressions.Window.partitionBy(col("key"))
    val cum = hist
      .withColumn("cum", sum(col("cnt")).over(byBin))
      .withColumn("total", sum(col("cnt")).over(whole))
    val ps = percentiles.map(_.toLong).toDF("p")
    cum.crossJoin(broadcast(ps))
      .filter(col("cum") * lit(100L) >= col("p") * col("total"))
      .groupBy(col("key"), col("p")).agg(min(col("bin")).as("bin"))
      .select(col("key"), col("p"), col("bin"),
        when(col("bin") === 0L, lit(0L))
          .otherwise(expr("shiftleft(CAST(1 AS BIGINT), CAST(bin - 1 AS INT))"))
          .as("lo"),
        (expr("shiftleft(CAST(1 AS BIGINT), CAST(bin AS INT))") - lit(1L))
          .as("hi"))
  }

  // ---- exact quantiles for bounded-universe integer values ----------
  // histPercentiles answers percentile BANDS in constant state; when
  // the value universe is bounded (doc lengths, token counts, quality
  // scores on an integer grid — the usual card columns), the
  // per-VALUE count ledger `(key, v, cnt)` stays small (≤ |universe|
  // rows per key), merges by count addition like every other ledger
  // here, and answers EXACT type-1 quantiles at read time:
  //   q(p) = min{ v : cum(v)·100 ≥ p·total }.
  // Unlike a KLL/GK sketch the answer is deterministic and replays
  // bit-for-bit in the DuckDB oracle; unlike percentile_approx it is
  // exact. The trade is ledger size linear in per-key distinct
  // values — the bounded-universe contract callers must own (an
  // unbounded DOUBLE column belongs in histPartial's bands instead).

  /** Value-count ledger `(key, v, cnt)` of `valCol` by `keyCol`. */
  def quantPartial(df: DataFrame, keyCol: String, valCol: String): DataFrame =
    df.select(col(keyCol).as("key"), col(valCol).cast("long").as("v"))
      .groupBy(col("key"), col("v")).agg(count(lit(1)).as("cnt"))

  /** Sum-merge two value-count ledgers. */
  def quantMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("key"), col("v"))
      .agg(sum(col("cnt")).as("cnt"))

  /** Collapse many value-count partial rows into one ledger. */
  def quantFold(partials: DataFrame): DataFrame =
    partials.groupBy(col("key"), col("v")).agg(sum(col("cnt")).as("cnt"))

  // ---- co-moments: correlation as a mergeable ledger -----------------
  // Pearson correlation over two integer-grid columns is ALGEBRAIC in
  // the 6 co-moments (n, Σx, Σy, Σx², Σy², Σxy) — each a LONG sum, so
  // the ledger folds exactly like `partial` and the corpus never
  // rescans to answer "did length and quality drift apart this
  // release". Overflow bound mirrors partial's sumsq note: per key,
  // n·max|x|·max|y| < 2^63. The read rearranges r = cov/(σx·σy) into
  // one integer numerator and two integer variance terms, taking a
  // SINGLE double division at the very end (micro-quantized) so the
  // oracle replays it bit-for-bit.

  /** Co-moment ledger `(key, n, sx, sy, sxx, syy, sxy)` of integer
    * columns `xCol`, `yCol` grouped by `keyCol`. */
  def corrPartial(df: DataFrame, keyCol: String, xCol: String,
                  yCol: String): DataFrame = {
    val x = col(xCol).cast("long"); val y = col(yCol).cast("long")
    df.groupBy(col(keyCol).as("key")).agg(
      count(lit(1)).as("n"),
      sum(x).as("sx"), sum(y).as("sy"),
      sum(x * x).as("sxx"), sum(y * y).as("syy"),
      sum(x * y).as("sxy"))
  }

  /** Sum-merge two co-moment ledgers. */
  def corrMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("key")).agg(
      sum(col("n")).as("n"),
      sum(col("sx")).as("sx"), sum(col("sy")).as("sy"),
      sum(col("sxx")).as("sxx"), sum(col("syy")).as("syy"),
      sum(col("sxy")).as("sxy"))

  /** Read-time Pearson r from the ledger, micro-quantized:
    * r = (n·Σxy − Σx·Σy) / √((n·Σxx − Σx²)·(n·Σyy − Σy²)) — the
    * numerator and both variance terms are exact integers, the
    * division + sqrt happen once on the final pair (one IEEE double
    * op chain, engine-identical), then quantize. Degenerate keys
    * (either variance 0) report r_micro = 0. */
  def corrRead(ledger: DataFrame): DataFrame = {
    val num = col("n") * col("sxy") - col("sx") * col("sy")
    val vx = col("n") * col("sxx") - col("sx") * col("sx")
    val vy = col("n") * col("syy") - col("sy") * col("sy")
    ledger.select(col("key"), col("n"),
      when(vx <= 0L || vy <= 0L, 0L)
        .otherwise(floor(num.cast("double")
          / sqrt(vx.cast("double") * vy.cast("double")) * 1000000.0
          + lit(0.5)).cast("long"))
        .as("r_micro"))
  }

  /** Read-time EXACT percentiles from a value-count ledger: for each
    * requested percentile p, the smallest value whose cumulative
    * count reaches p% of the key's total (type-1 / lower quantile).
    * Integer arithmetic only (`cum·100 ≥ p·total`), so any fold
    * order, any slice boundary, same answer — and the oracle replays
    * it with one window. The ledger shuffles key-×-universe-sized
    * rows, never corpus rows. */
  def quantiles(ledger: DataFrame, percentiles: Seq[Int]): DataFrame = {
    val sp = ledger.sparkSession
    import sp.implicits._
    val byV = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key")).orderBy(col("v"))
    val whole = org.apache.spark.sql.expressions.Window.partitionBy(col("key"))
    val cum = ledger
      .withColumn("cum", sum(col("cnt")).over(byV))
      .withColumn("total", sum(col("cnt")).over(whole))
    val ps = percentiles.map(_.toLong).toDF("p")
    cum.crossJoin(broadcast(ps))
      .filter(col("cum") * lit(100L) >= col("p") * col("total"))
      .groupBy(col("key"), col("p")).agg(min(col("v")).as("v"))
  }
}

/** Bounded-state approximate top-k — the heavy-hitter ledger.
  *
  * Exact global token counts need vocabulary-sized state per slice;
  * the standard bounded-state answer keeps each slice's top-`m`
  * `(token, cnt)` rows (deterministic order: cnt DESC, token ASC) and
  * merges by summing counts over the union, re-truncating to `m`
  * (Misra-Gries-flavored: a count missing from one slice's summary
  * contributes nothing, so merged counts are LOWER BOUNDS — exact for
  * any token inside every slice's top-m, and the classic guarantee
  * holds: any token with true share > 1/m per slice survives). Every
  * step is integer counting plus a total-order row_number, so the
  * whole fold — including intermediate truncations — replays exactly
  * in the DuckDB oracle (q106 unrolls the merge rounds the way the
  * BPE oracle unrolls training rounds).
  *
  * Scale shape: per-slice state is m rows per key regardless of slice
  * size; the merge shuffles ≤ slices·m rows per key. The per-slice
  * count itself is the one data-bound stage (map-side-combined
  * groupBy over the slice's tokens).
  */
object TopKLedger {

  /** Slice summary: top-`m` tokens of `tokensCol` (an array column)
    * per key, by `(cnt DESC, token ASC)`. */
  def partial(df: DataFrame, keyCol: String, tokensCol: Column,
              m: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key"))
      .orderBy(col("cnt").desc, col("token").asc)
    df.select(col(keyCol).as("key"), explode(tokensCol).as("token"))
      .groupBy(col("key"), col("token")).agg(count(lit(1)).as("cnt"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= m).drop("__rn")
  }

  /** Merge two summaries: sum counts over the union, re-truncate. */
  def merge(a: DataFrame, b: DataFrame, m: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key"))
      .orderBy(col("cnt").desc, col("token").asc)
    a.unionByName(b).groupBy(col("key"), col("token"))
      .agg(sum(col("cnt")).as("cnt"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= m).drop("__rn")
  }

  /** Read-time ranked top-`k` from a ledger. */
  def topK(ledger: DataFrame, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key"))
      .orderBy(col("cnt").desc, col("token").asc)
    ledger.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("key"), col("rank"), col("token"), col("cnt"))
  }
}
