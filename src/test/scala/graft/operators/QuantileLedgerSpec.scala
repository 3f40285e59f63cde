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
