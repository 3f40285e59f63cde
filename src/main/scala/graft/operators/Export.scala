package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sharded corpus export — the last step of a training-data pipeline:
  * pack the cleaned corpus into a FIXED number of deterministic,
  * reproducible shard files that a training job reads back with no
  * coordination (shard i of N by filename).
  *
  * Shard assignment is an md5 bucket of the id — the same
  * engine-portable recipe as [[Sampling]]'s splits (q46): any system
  * that can md5 a string reproduces the exact membership, so the
  * engine, the trainer's data loader, and the SQL oracle all agree on
  * which rows live in which shard, forever, with no stored mapping.
  *
  * Scale shape: ONE shuffle, keyed on the shard (repartition by the
  * shard column into exactly `numShards` partitions), rows sorted
  * within each shard by id (`sortWithinPartitions` — a per-partition
  * sort, NO global sort / range exchange), then a partitioned parquet
  * write. Hash partitioning may co-locate several shard values in one
  * task (and leave other tasks empty) — that is fine: `partitionBy`
  * still writes each shard to its own directory, the `(shard, id)`
  * within-partition sort keeps every directory's row order
  * deterministic, and `maxRecordsPerFile` splits oversized shards
  * into numbered parts without re-shuffling. Reproducible
  * end-to-end: same input → same shard membership, same in-file row
  * order.
  */
object Export {

  /** Deterministic shard id ∈ [0, numShards): first 6 md5 hex chars
    * of the id, mod numShards (uniform for any numShards ≪ 2^24 —
    * the q46/q57 bucket recipe). The uniformity precondition is
    * enforced: 2^20 keeps the worst-case modulus bias below
    * 2^20/2^24 ≈ 6%, and no real export wants a million shards. */
  def shardKey(id: Column, numShards: Int): Column = {
    require(numShards > 0 && numShards < (1 << 20),
      s"numShards must be in [1, 2^20) for an unbiased md5-prefix " +
        s"modulus (got $numShards)")
    conv(substring(md5(id.cast("string")), 1, 6), 16, 10)
      .cast("long") % numShards
  }

  /** The export plan: input rows + their shard assignment,
    * repartitioned on the shard key (each Spark partition holds whole
    * shards — possibly more than one, hash collisions permitting),
    * sorted by `(shard, id)` within each partition. Exposed separately
    * so the assignment is testable and oracle-checkable without
    * touching a filesystem. */
  def sharded(df: DataFrame, idCol: String, numShards: Int): DataFrame =
    df.withColumn("shard", shardKey(col(idCol), numShards))
      .repartition(numShards, col("shard"))
      .sortWithinPartitions(col("shard"), col(idCol))

  /** Write `df` as `numShards` deterministic shards under `dir`
    * (`dir/shard=N/part-*.parquet`). Readers prune by shard directory
    * (`spark.read.parquet(dir).where(col("shard") === i)` never
    * touches other shards' files). */
  def writeShards(df: DataFrame, idCol: String, dir: String,
                  numShards: Int, maxRecordsPerFile: Long = 0L): Unit =
    sharded(df, idCol, numShards)
      .write
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("shard")
      .mode("overwrite")
      .parquet(dir)

  /** The shard manifest a pipeline records next to the data: per-shard
    * row count, id range, and byte-ish payload total. Computed from
    * the same assignment expression, so it is exact for the files
    * [[writeShards]] writes — and SQL-replayable, which keeps the
    * whole export contract oracle-verified. */
  def manifest(df: DataFrame, idCol: String, payloadCol: String,
               numShards: Int): DataFrame =
    df.withColumn("shard", shardKey(col(idCol), numShards))
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_rows"),
        min(col(idCol)).as("min_id"),
        max(col(idCol)).as("max_id"),
        sum(length(coalesce(col(payloadCol), lit(""))).cast("long"))
          .as("payload_chars"))

  // ---- Range-sharded (globally ordered) export -----------------------

  /** Range shard assignment from SAMPLED boundaries — the TeraSort
    * shape (O'Malley 2008), and how `ORDER BY` at 100 TB actually
    * works: ONE mergeable-sketch aggregation computes numShards−1
    * approximate quantile boundaries of `sortCol`
    * (`percentile_approx`, a Greenwald–Khanna sketch — only sketch
    * partials cross the wire), the tiny boundary row broadcasts, and
    * every row's shard is a scan-local comparison chain
    * `1 + |{i : x > b_i}|`. No global sort, no RangePartitioning
    * exchange, no driver-side sampling pass: the plan is
    * agg + broadcast join + projection.
    *
    * Contract: shards are RANGE-DISJOINT (every value in shard s ≤
    * every value in shard s+1 — ties at a boundary all land in the
    * lower shard since assignment is a pure function of the value),
    * so `sortWithinPartitions` after a shard-keyed repartition yields
    * a GLOBALLY ordered corpus by (shard, sortCol) — read the shard
    * directories in order and the stream is sorted. Shard POPULATIONS
    * are balanced only to sketch accuracy (the x25/x30 trade);
    * [[shardKey]] stays the right tool when balance matters more than
    * order. Sketch boundaries are not SQL-replayable → rows-only
    * (x31) + spec, the established split. */
  def rangeSharded(df: DataFrame, sortCol: String, numShards: Int,
                   accuracy: Int = 10000): DataFrame = {
    require(numShards >= 2, s"numShards must be >= 2 (got $numShards)")
    val probs = (1 until numShards).map(i => lit(i.toDouble / numShards))
    val bounds = df.agg(
      percentile_approx(col(sortCol), array(probs: _*), lit(accuracy))
        .as("__bnd"))
    val shardExpr = (1 until numShards)
      .map(i => when(col(sortCol) > element_at(col("__bnd"), i), 1L)
        .otherwise(0L))
      .foldLeft(lit(1L))(_ + _)
    df.join(broadcast(bounds))
      .withColumn("shard", shardExpr)
      .drop("__bnd")
  }

  /** [[rangeSharded]] + the one shard-keyed shuffle + within-shard
    * sort: the globally-ordered export plan (order across shard
    * directories, order within every file). */
  def rangeShardedSorted(df: DataFrame, sortCol: String,
                         numShards: Int, accuracy: Int = 10000): DataFrame =
    rangeSharded(df, sortCol, numShards, accuracy)
      .repartition(numShards, col("shard"))
      .sortWithinPartitions(col("shard"), col(sortCol))

  /** [[rangeSharded]] under DETERMINISTIC sampled-exact boundaries
    * ([[Boundaries.sampled]] — the TeraSort sampler, engine-portable)
    * instead of a GK sketch: same TeraSort shape and the same
    * sampling-accuracy trade, but the boundaries are exact order
    * statistics of a deterministic md5 sample, so the whole layout
    * decision replays in SQL (the x31 oracle) and is stable under
    * repartitioning — properties the sketch form cannot offer. */
  def rangeShardedSampled(df: DataFrame, idCol: String, sortCol: String,
                          numShards: Int,
                          permille: Int = Boundaries.Auto): DataFrame = {
    require(numShards >= 2, s"numShards must be >= 2 (got $numShards)")
    val b = Boundaries.sampled(df, idCol, col(sortCol), numShards, permille)
    df.withColumn("shard", Boundaries.partOf(col(sortCol).cast("long"), b))
  }
}
