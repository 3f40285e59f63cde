package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout — Z-order (Morton) clustering, the
  * standard answer to "file skipping must work on TWO columns at
  * once" (Morton 1966; the technique behind Delta Lake's OPTIMIZE
  * ZORDER and ClickHouse/DuckDB space-filling-curve sorts).
  *
  * A layout range-sharded on column A alone prunes A-predicates
  * perfectly and B-predicates not at all — every shard spans B's full
  * range. Interleaving the bits of grid-quantized A and B
  * (`z = ...b1a1b0a0`) makes shard ranges narrow in BOTH dimensions,
  * so a per-shard min/max manifest (the parquet row-group-stats /
  * Delta file-stats analog) skips shards for 2-d box predicates and
  * for either single column — moderate pruning on both beats perfect
  * on one when queries mix.
  *
  * Everything here is integer arithmetic on the Spark side AND in the
  * oracle: grid quantization is exact integer scaling from the
  * columns' min/max (1-row broadcast), the z-value is a bit-shift
  * fold, shard boundaries are EXACT type-1 percentiles of z read from
  * a [[StatsLedger.quantiles]]-shaped cumulative (the z universe is
  * 4^bits — bounded by construction, which is what makes exact
  * boundaries affordable; a raw unbounded sort key at 100 TB takes
  * [[Export.rangeSharded]]'s sketch boundaries instead), and ties at
  * a boundary land in the lower shard. Deterministic end to end, so
  * q119 hash-replays the whole layout decision in SQL.
  *
  * Scale shape: min/max and the z histogram are one map-side-combined
  * agg each (the histogram is ≤ 4^bits rows); shard assignment is a
  * scan-local comparison chain against a broadcast boundary row; the
  * manifest is one groupBy over numShards keys. Writing the layout is
  * the same one shard-keyed shuffle as [[Export.writeShards]]. The
  * corpus never sorts globally.
  */
object Layout {

  /** Morton z-value of two grid coordinates in `[0, 2^bits)`: bit i
    * of `a` lands at z-bit 2i, bit i of `b` at 2i+1. A pure shift/
    * mask fold — codegen-friendly, no UDF. */
  def zValue(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31] (got $bits)")
    val al = a.cast("long")
    val bl = b.cast("long")
    (0 until bits).map { i =>
      shiftleft(shiftrightunsigned(al, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(
          shiftleft(shiftrightunsigned(bl, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Integer grid coordinate in `[0, 2^bits)` for `c` given the
    * column's min/max: `(c − mn) · 2^bits ÷ (mx − mn + 1)`, exact
    * integer arithmetic (callers own `range · 2^bits < 2^63`, true
    * for any 32-bit-ish key domain). The divide is SQL `div`
    * (IntegralDivide), not `/` — Spark's `/` on longs is double
    * division, whose rounded quotient can land on the wrong integer
    * once the numerator exceeds ~2^53. */
  def gridCoord(c: Column, mn: Column, mx: Column, bits: Int): Column = {
    val num = (c.cast("long") - mn) * lit(1L << bits)
    val den = mx - mn + lit(1L)
    org.apache.spark.sql.GraftBridge.column(
      org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        org.apache.spark.sql.GraftBridge.expression(num),
        org.apache.spark.sql.GraftBridge.expression(den)))
  }

  /** The layout decision + its manifest in one frame: rows of
    * `(shard, n_rows, min_a, max_a, min_b, max_b)` for `df`
    * z-order-sharded on (`aCol`, `bCol`).
    *
    * `numShards` must divide 100 (boundaries sit on integer
    * percentiles so the oracle replays them). The manifest's min/max
    * are over the ORIGINAL column values — exactly what a reader
    * consults to skip shards for a box predicate. */
  def zorderManifest(df: DataFrame, aCol: String, bCol: String,
                     bits: Int = 8, numShards: Int = 10): DataFrame = {
    val sharded = zorderSharded(df, aCol, bCol, bits, numShards)
    sharded.groupBy(col("shard")).agg(
      count(lit(1)).as("n_rows"),
      min(col(aCol).cast("long")).as("min_a"),
      max(col(aCol).cast("long")).as("max_a"),
      min(col(bCol).cast("long")).as("min_b"),
      max(col(bCol).cast("long")).as("max_b"))
  }

  /** BLOOM skipping manifest — per-shard bloom filters over a
    * NON-partition column (the Delta/Iceberg bloom-index use case):
    * a table laid out by time (or z-order, or anything else) still
    * answers point lookups on a different key by consulting one
    * small bloom per shard and reading only the shards that might
    * hold the key. No false negatives (the filter flags a superset),
    * so the pruned read is EXACT; false positives only cost extra
    * shard reads at the documented (1−e^(−hn/m))^h rate. One
    * map-side-OR-combined aggregation builds it ([[graft.functions
    * .Bloom.bloomAgg]] is a mergeable TypedImperativeAggregate);
    * the manifest is numShards rows of m/8 bytes. */
  def bloomManifest(sharded: DataFrame, shardCol: String, keyCol: String,
                    numBits: Int = 1 << 20, numHashes: Int = 5): DataFrame =
    sharded.groupBy(col(shardCol))
      .agg(graft.functions.Bloom
        .bloomAgg(col(keyCol).cast("string"), numBits, numHashes)
        .as("bloom"))

  /** The shards that MIGHT hold any of `keys` — the definite-miss
    * shards are gone, which is the skip. Manifest-sized work. */
  def bloomCandidates(manifest: DataFrame, shardCol: String,
                      keys: Seq[String]): DataFrame =
    manifest.filter(keys
        .map(k => graft.functions.Bloom.mightContain(col("bloom"), lit(k)))
        .reduce(_ || _))
      .select(col(shardCol))

  /** `df` + a `shard` column (1-based) assigning each row its
    * z-order range shard. See [[zorderManifest]] for the contract. */
  def zorderSharded(df: DataFrame, aCol: String, bCol: String,
                    bits: Int = 8, numShards: Int = 10): DataFrame = {
    require(numShards >= 2 && 100 % numShards == 0,
      s"numShards must divide 100 (got $numShards)")
    val mm = df.agg(
      min(col(aCol).cast("long")).as("__mna"),
      max(col(aCol).cast("long")).as("__mxa"),
      min(col(bCol).cast("long")).as("__mnb"),
      max(col(bCol).cast("long")).as("__mxb"))
    val withZ = df.crossJoin(broadcast(mm))
      .withColumn("__z", zValue(
        gridCoord(col(aCol), col("__mna"), col("__mxa"), bits),
        gridCoord(col(bCol), col("__mnb"), col("__mxb"), bits), bits))
      .drop("__mna", "__mxa", "__mnb", "__mxb")
    // exact boundaries from the bounded z universe (≤ 4^bits values):
    // b_p = min{ z : cum(z)·100 ≥ p·total }, p = 100/numShards · i
    val zc = withZ.groupBy(col("__z")).agg(count(lit(1)).as("__c"))
    val byZ = org.apache.spark.sql.expressions.Window.orderBy(col("__z"))
    val cum = zc.withColumn("__cum", sum(col("__c")).over(byZ))
      .crossJoin(broadcast(zc.agg(sum(col("__c")).as("__tot"))))
    val step = 100 / numShards
    val ps = (1 until numShards).map(i => lit((i * step).toLong))
    val bndCols = (1 until numShards).map { i =>
      min(when(col("__cum") * lit(100L) >= ps(i - 1) * col("__tot"),
        col("__z"))).as(s"__b$i")
    }
    val bnd = cum.agg(bndCols.head, bndCols.tail: _*)
    val shardExpr = (1 until numShards)
      .map(i => when(col("__z") > col(s"__b$i"), 1L).otherwise(0L))
      .foldLeft(lit(1L))(_ + _)
    withZ.crossJoin(broadcast(bnd))
      .withColumn("shard", shardExpr)
      .drop(("__z" +: (1 until numShards).map(i => s"__b$i")): _*)
  }
}
