package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Z-order layout: the Morton interleave is the textbook bit
  * pattern, shards partition the corpus exactly, and the manifest
  * proves the 2-d win — a single-column layout cannot skip shards
  * for the other column's predicates, the z-order layout can. */
class ZorderSpec extends SparkSpec {
  import spark.implicits._

  // 100×100 uniform grid: every (x, y) cell exactly once
  private lazy val grid = (0 until 10000)
    .map(i => (i.toLong, (i % 100).toLong, (i / 100).toLong))
    .toDF("id", "x", "y")

  test("zValue interleaves bits (a→even, b→odd)") {
    val r = spark.range(1).select(
      Layout.zValue(lit(5L), lit(3L), 3).as("z1"),   // 101 ⨯ 011
      Layout.zValue(lit(0L), lit(7L), 3).as("z2"),   // 000 ⨯ 111
      Layout.zValue(lit(7L), lit(0L), 3).as("z3"))
      .collect()(0)
    assert(r.getLong(0) == 27L)  // 011011₂
    assert(r.getLong(1) == 42L)  // 101010₂
    assert(r.getLong(2) == 21L)  // 010101₂
  }

  test("gridCoord is exact integer division past double precision") {
    // a 32-bit key domain at bits=31 puts the numerator near 2^63 —
    // the old double `/` could round the quotient onto the wrong
    // integer; the SQL `div` form must match BigInt exactly
    val bits = 31
    val mn = 0L; val mx = (1L << 32) - 2L
    val vals = Seq(0L, 1L, (1L << 32) - 3L, (1L << 31) + 12345L,
      (1L << 30) - 7L, 3037000499L)
    val out = vals.toDF("v")
      .select(Layout.gridCoord(col("v"), lit(mn), lit(mx), bits).as("g"))
      .as[Long].collect().toSeq
    val den = BigInt(mx - mn + 1L)
    val exp = vals.map(v => ((BigInt(v - mn) * BigInt(1L << bits)) / den).toLong)
    assert(out == exp)
  }

  test("shards partition the corpus; manifest row per shard") {
    val m = Layout.zorderManifest(grid, "x", "y", bits = 8, numShards = 10)
      .collect()
    assert(m.length == 10)
    assert(m.map(_.getAs[Long]("n_rows")).sum == 10000L)
  }

  test("y-only predicates skip z-order shards; an x-sorted layout cannot") {
    val (lo, hi) = (40L, 49L)
    def overlapping(aCol: String, bCol: String): Long =
      Layout.zorderManifest(grid, aCol, bCol, bits = 8, numShards = 10)
        .filter(col("min_b") <= hi && col("max_b") >= lo)
        .count()
    // x-sorted layout (z of x with itself is monotone in x): every
    // shard spans y's whole range, so nothing skips
    val xSorted = Layout.zorderManifest(grid, "x", "x", bits = 8,
        numShards = 10)
      .join(Layout.zorderSharded(grid, "x", "x", bits = 8, numShards = 10)
          .groupBy(col("shard"))
          .agg(min(col("y")).as("mny"), max(col("y")).as("mxy")),
        "shard")
      .filter(col("mny") <= hi && col("mxy") >= lo)
      .count()
    assert(xSorted == 10L, s"x-sorted layout skipped shards? $xSorted")
    val z = overlapping("x", "y")
    assert(z < 10L, s"z-order layout must skip some shards, overlapped $z")
  }

  test("a 2-d box prunes to a minority of z-order shards") {
    val m = Layout.zorderManifest(grid, "x", "y", bits = 8, numShards = 10)
    val hit = m.filter(
      col("min_a") <= 30L && col("max_a") >= 20L &&
        col("min_b") <= 30L && col("max_b") >= 20L).count()
    assert(hit <= 5L, s"box [20,30]² overlapped $hit of 10 shards")
  }

  test("the manifest drives a pruned layout read equal to the full filter") {
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    Layout.zorderSharded(grid, "x", "y", bits = 8, numShards = 10)
      .write.partitionBy("shard").mode("overwrite").parquet(dir)
    val (a1, a2, b1, b2) = (20L, 30L, 20L, 30L)
    val hit = Layout.zorderManifest(grid, "x", "y", bits = 8, numShards = 10)
      .filter(col("min_a") <= a2 && col("max_a") >= a1 &&
        col("min_b") <= b2 && col("max_b") >= b1)
      .select(col("shard")).as[Long].collect()
    assert(hit.length < 10, "the box must skip at least one shard")
    val pruned = spark.read.parquet(dir)
      .filter(col("shard").isin(hit: _*))
      .filter(col("x").between(a1, a2) && col("y").between(b1, b2))
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("shard"), plan)
    val got = pruned.select("id").as[Long].collect().toSet
    val want = grid.filter(col("x").between(a1, a2) &&
        col("y").between(b1, b2))
      .select("id").as[Long].collect().toSet
    assert(got == want)
  }

  test("bloom manifest skips definite-miss shards, never true ones") {
    // 20 shards, each holding a disjoint key range on a non-shard key
    val rows = (0L until 4000L)
      .map(i => (i / 200L, s"k$i", i)).toDF("shard", "key", "v")
    val manifest = Layout.bloomManifest(rows, "shard", "key",
      numBits = 1 << 16)
    assert(manifest.count() == 20L)
    // a key living in exactly one shard: candidates must include it
    // (no false negatives) and skip most of the rest
    val cand = Layout.bloomCandidates(manifest, "shard", Seq("k777"))
      .as[Long].collect().toSet
    assert(cand.contains(3L), s"true shard missing: $cand")
    assert(cand.size < 20, s"no skipping happened: $cand")
    // the pruned read is exact — present and absent keys alike
    val pruned = rows.filter(col("shard").isin(cand.toSeq: _*))
      .filter(col("key") === "k777").select("v").as[Long].collect().toSeq
    assert(pruned == Seq(777L))
    val gone = Layout.bloomCandidates(manifest, "shard", Seq("nope"))
      .as[Long].collect()
    val prunedGone = rows
      .filter(col("shard").isin(gone.toSeq: _*))
      .filter(col("key") === "nope").count()
    assert(prunedGone == 0L)
  }

  test("sharding is deterministic under repartition") {
    val a = Layout.zorderSharded(grid, "x", "y", bits = 8, numShards = 10)
      .select("id", "shard").as[(Long, Long)].collect().toMap
    val b = Layout.zorderSharded(grid.repartition(7), "x", "y",
        bits = 8, numShards = 10)
      .select("id", "shard").as[(Long, Long)].collect().toMap
    assert(a == b)
  }
}
