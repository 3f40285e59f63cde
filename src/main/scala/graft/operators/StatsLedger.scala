package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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
    * aggregates of `valCol` grouped by `keyCol`. */
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

  /** Empty ledger with the right schema (the `readStateOr` fallback —
    * must stay semantically empty, see Dedup.readStateOr's contract). */
  def empty(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(String, Long, Long, Long, Long, Long)]
      .toDF("key", "n", "sum", "min", "max", "sumsq")
  }
}
