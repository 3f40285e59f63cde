package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact quantiles from the mergeable value-count ledger: any fold
  * order equals the one-shot ledger, and the read matches the
  * classic type-1 quantile computed on the collected data. */
class QuantileLedgerSpec extends SparkSpec {
  import spark.implicits._

  private val rows: Seq[(String, Long)] =
    (1L to 400L).map(i => (s"k${i % 5}", (i * 37) % 211))

  private def norm(df: DataFrame): Set[(String, Long, Long)] =
    df.select("key", "p", "v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

  test("fold order does not matter and equals the one-shot ledger") {
    val df = rows.toDF("key", "v")
    val ps = Seq(25, 50, 75, 90, 99)
    val oneShot = StatsLedger.quantiles(
      StatsLedger.quantPartial(df, "key", "v"), ps)
    val parts = (0 until 4).map(i =>
      StatsLedger.quantPartial(df.filter(col("v") % 4 === i), "key", "v"))
    val foldedA = StatsLedger.quantiles(
      parts.reduceLeft(StatsLedger.quantMerge), ps)
    val foldedB = StatsLedger.quantiles(
      Seq(parts(3), parts(1), parts(0), parts(2))
        .reduceLeft(StatsLedger.quantMerge), ps)
    assert(norm(foldedA) == norm(oneShot))
    assert(norm(foldedB) == norm(oneShot))
  }

  test("the read is the exact type-1 quantile") {
    val df = rows.toDF("key", "v")
    val got = norm(StatsLedger.quantiles(
      StatsLedger.quantPartial(df, "key", "v"), Seq(50, 90)))
    // reference: sort each key's values, take the ceil(p/100·n)-th
    val byKey = rows.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val expect = for {
      (k, vs) <- byKey.toSet
      p <- Set(50L, 90L)
    } yield {
      val idx = math.ceil(p * vs.length / 100.0).toInt - 1
      (k, p, vs(math.max(idx, 0)))
    }
    assert(got == expect)
  }

  test("corr ledger: fold order invariant; r matches the closed form") {
    // y = 2x + deterministic jitter → strong but imperfect correlation
    val rows = (1L to 200L).map(i => ("k", i, 2 * i + (i * 7) % 11))
      .toDF("key", "x", "y")
    val parts = (0 until 3).map(i =>
      StatsLedger.corrPartial(rows.filter(col("x") % 3 === i),
        "key", "x", "y"))
    val a = StatsLedger.corrRead(parts.reduce(StatsLedger.corrMerge))
      .collect()(0).getLong(2)
    val b = StatsLedger.corrRead(Seq(parts(2), parts(0), parts(1))
        .reduce(StatsLedger.corrMerge))
      .collect()(0).getLong(2)
    val oneShot = StatsLedger.corrRead(
      StatsLedger.corrPartial(rows, "key", "x", "y"))
      .collect()(0).getLong(2)
    assert(a == oneShot && b == oneShot)
    // closed form on the driver
    val xs = (1L to 200L).map(_.toDouble)
    val ys = (1L to 200L).map(i => (2 * i + (i * 7) % 11).toDouble)
    val n = xs.length.toDouble
    val num = n * xs.zip(ys).map { case (x, y) => x * y }.sum -
      xs.sum * ys.sum
    val den = math.sqrt((n * xs.map(x => x * x).sum - xs.sum * xs.sum) *
      (n * ys.map(y => y * y).sum - ys.sum * ys.sum))
    val want = math.floor(num / den * 1e6 + 0.5).toLong
    assert(math.abs(a - want) <= 1L, s"$a vs $want") // driver sums reorder
    // degenerate: constant column reports 0
    val const = (1L to 50L).map(i => ("k", i, 9L)).toDF("key", "x", "y")
    assert(StatsLedger.corrRead(
      StatsLedger.corrPartial(const, "key", "x", "y"))
      .collect()(0).getLong(2) == 0L)
  }

  test("quantFold collapses appended partial rows to the same ledger") {
    val df = rows.toDF("key", "v")
    val parts = (0 until 3).map(i =>
      StatsLedger.quantPartial(df.filter(col("v") % 3 === i), "key", "v"))
    val appended = parts.reduce(_ unionByName _) // the parquet-dir shape
    val a = StatsLedger.quantFold(appended)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val b = StatsLedger.quantPartial(df, "key", "v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(a == b)
  }
}
