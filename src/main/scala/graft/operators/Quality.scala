package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality gates (SURVEY.md §2 A-1..A-4, F-7/F-8, X-11, T-6).
  *
  * Reference: dags/data_quality.py — freshness (fail if 0 docs with
  * `fetched_at >= now-2h`, :29-37) and completeness (fail unless ≥ 90%
  * of last-day docs carry a sentiment, :44-67). Both are single-pass
  * aggregations; the conditional count folds into the same
  * HashAggregate as the total (one scan, no second pass).
  */
object Quality {

  val CompletenessThreshold = 90.0

  /** A-1/A-2: filtered count since a cutoff. */
  def freshCount(df: DataFrame, tsCol: String, cutoff: Column): Column =
    count(when(col(tsCol) >= cutoff, 1))

  /** A-2+A-3+A-4 in one aggregation pass: total, missing, quality%. */
  def qualityReport(df: DataFrame, tsCol: String, cutoff: Column,
                    missingWhen: Column): DataFrame =
    df.filter(col(tsCol) >= cutoff)
      .agg(
        count(lit(1)).as("total"),
        sum(when(missingWhen, 1).otherwise(0)).as("missing"))
      .withColumn("quality_rate",
        (col("total") - col("missing")) * 100.0 / col("total"))

  /** T-6 freshness gate: throws if nothing landed inside the window —
    * the engine analog of data_quality.py:33-34's raise. */
  def assertFresh(df: DataFrame, tsCol: String, cutoff: Column): Long = {
    val n = df.filter(col(tsCol) >= cutoff).count()
    if (n == 0) throw new IllegalStateException(
      s"freshness gate: no rows with $tsCol >= cutoff")
    n
  }

  /** Completeness gate: data_quality.py:63-67. */
  def assertComplete(df: DataFrame, tsCol: String, cutoff: Column,
                     missingWhen: Column,
                     threshold: Double = CompletenessThreshold): Double = {
    val row = qualityReport(df, tsCol, cutoff, missingWhen).head()
    val rate = row.getAs[Double]("quality_rate")
    if (rate < threshold) throw new IllegalStateException(
      f"completeness gate: $rate%.2f%% < $threshold%%")
    rate
  }
}
