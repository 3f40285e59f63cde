package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampled-exact quantile boundaries — the TeraSort
  * sampler made engine-portable: sample rows by the md5 id bucket
  * ([[Sampling.bucketOf]], the q46 discipline — deterministic, uniform,
  * partition-stable), then take EXACT order statistics of the sample.
  * Unlike a GK/`percentile_approx` sketch (whose merge is
  * partitioning-sensitive and which no SQL engine reproduces), every
  * step here replays bit-for-bit in DuckDB: the md5 filter, the rank
  * `⌈i·n/parts⌉`, the boundary value at that rank. Accuracy is the
  * usual sampling bound (boundary rank error ~ n/√(sample size)), the
  * same trade TeraSort ships with; `permille` is the knob.
  *
  * Scale shape: one sample-sized distributed sort + zipWithIndex
  * (never a one-task window), boundary values collected driver-side —
  * parts-sized, the broadcast-model pattern. */
object Boundaries {

  /** Boundary values `b_1 ≤ … ≤ b_{parts−1}` of `value` (cast to
    * long) at sample ranks `⌈i·n/parts⌉`. Collided ranks (n < parts)
    * dedup, so fewer boundaries can return; empty sample returns none
    * (callers put everything in part 1). */
  def sampled(df: DataFrame, idCol: String, value: Column, parts: Int,
              permille: Int = 500): Array[Long] = {
    require(parts >= 2, s"parts must be >= 2 (got $parts)")
    require(permille >= 1 && permille <= 1000,
      s"permille must be in [1, 1000] (got $permille)")
    val samp = df.filter(Sampling.bucketOf(col(idCol)) < permille)
      .select(value.cast("long").as("v"))
    val n = samp.count()
    if (n == 0L) return Array.empty
    val ranks: Set[Long] =
      (1 until parts).map(i => (i.toLong * n + parts - 1) / parts).toSet
    val sorted = samp.orderBy(col("v"))
    val rset = df.sparkSession.sparkContext.broadcast(ranks)
    sorted.rdd.zipWithIndex()
      .filter { case (_, idx) => rset.value.contains(idx + 1) }
      .map(_._1.getLong(0)).collect().sorted
  }

  /** Part id in `[1, |boundaries|+1]`: `1 + Σ [v > b_i]` — ascending
    * parts, the [[graft.operators.Export.rangeSharded]] convention. */
  def partOf(v: Column, boundaries: Array[Long]): Column =
    boundaries.foldLeft(lit(1L)) { (acc, b) =>
      acc + when(v > b, 1L).otherwise(0L)
    }
}
