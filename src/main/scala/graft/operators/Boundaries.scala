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

  /** Sentinel permille meaning "scale the sampling rate with the
    * corpus" — see [[autoPermille]]. */
  val Auto: Int = 0

  /** Fixed-TARGET-size sampling rate (the [[graft.operators.Similarity]]
    * `autoPlanes` discipline applied to the TeraSort sampler): a fixed
    * RATE sorts half of 100 TB; a fixed SIZE keeps the boundary
    * rank-error bound (relative rank error ~ 1/√sample) constant while
    * the sort stays sample-sized at any corpus. Integer-exact —
    * `min(max, max(1, ⌈1000·target/n⌉))` in pure integer arithmetic —
    * so a SQL oracle replays the same effective rate from the same
    * count. Caps at `maxPermille` (small corpora keep the dense
    * sample), floors at 1‰ (the md5 bucket granularity; at 10¹¹ rows
    * that is a 10⁸-row sample sort — trivial for the cluster that
    * holds the corpus). targetSample = 2¹⁶ ⇒ ~0.4% relative rank
    * error, far inside a curriculum bin. */
  def autoPermille(n: Long, maxPermille: Int = 500,
                   targetSample: Long = 65536L): Int = {
    require(maxPermille >= 1 && maxPermille <= 1000,
      s"maxPermille must be in [1, 1000] (got $maxPermille)")
    if (n <= 0L) maxPermille
    else math.min(maxPermille.toLong,
      math.max(1L, (1000L * targetSample + n - 1L) / n)).toInt
  }

  /** `permille`, or [[autoPermille]] of `df`'s row count when the
    * [[Auto]] sentinel was passed (one column-pruned count — callers
    * hand a checkpointed projection, so it never recomputes lineage). */
  def effectivePermille(df: DataFrame, permille: Int): Int =
    if (permille == Auto) autoPermille(df.count()) else permille

  /** Boundary values `b_1 ≤ … ≤ b_{parts−1}` of `value` (cast to
    * long) at sample ranks `⌈i·n/parts⌉`. Collided ranks (n < parts)
    * dedup, so fewer boundaries can return; empty sample returns none
    * (callers put everything in part 1). `permille =` [[Auto]] scales
    * the rate with the corpus ([[autoPermille]]). The sample is
    * persisted between the count and the sort — one evaluation of the
    * input plan, two jobs over the cached sample. */
  def sampled(df: DataFrame, idCol: String, value: Column, parts: Int,
              permille: Int = Auto): Array[Long] = {
    require(parts >= 2, s"parts must be >= 2 (got $parts)")
    require(permille == Auto || (permille >= 1 && permille <= 1000),
      s"permille must be Auto or in [1, 1000] (got $permille)")
    val pm = effectivePermille(df, permille)
    val samp = df.filter(Sampling.bucketOf(col(idCol)) < pm)
      .select(value.cast("long").as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = samp.count()
      if (n == 0L) return Array.empty
      val ranks: Set[Long] =
        (1 until parts).map(i => (i.toLong * n + parts - 1) / parts).toSet
      val sorted = samp.orderBy(col("v"))
      val rset = df.sparkSession.sparkContext.broadcast(ranks)
      sorted.rdd.zipWithIndex()
        .filter { case (_, idx) => rset.value.contains(idx + 1) }
        .map(_._1.getLong(0)).collect().sorted
    } finally samp.unpersist(blocking = false)
  }

  /** Part id in `[1, |boundaries|+1]`: `1 + Σ [v > b_i]` — ascending
    * parts, the [[graft.operators.Export.rangeSharded]] convention. */
  def partOf(v: Column, boundaries: Array[Long]): Column =
    boundaries.foldLeft(lit(1L)) { (acc, b) =>
      acc + when(v > b, 1L).otherwise(0L)
    }
}
