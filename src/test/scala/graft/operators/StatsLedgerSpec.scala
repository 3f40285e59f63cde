package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental algebraic aggregates ([[StatsLedger]]): any slicing,
  * any fold order, bit-equal to the one-shot aggregation — plus the
  * parquet state round-trip the funnel's ledgers rely on. */
class StatsLedgerSpec extends SparkSpec {
  import spark.implicits._

  private val rows: Seq[(String, Long)] =
    (1L to 300L).map(i => (s"src${i % 7}", (i * 31) % 997))

  private def collectLedger(df: DataFrame): Set[(String, Long, Long, Long, Long, Long)] =
    df.select("key", "n", "sum", "min", "max", "sumsq")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet

  test("three-way fold-in equals the one-shot partial") {
    val df = rows.toDF("source", "v")
    val full = StatsLedger.partial(df, "source", "v")
    val slices = (0 until 3).map(i => df.filter(col("v") % 3 === i))
    val folded = slices.tail.foldLeft(
      StatsLedger.partial(slices.head, "source", "v"))(
      (led, sl) => StatsLedger.foldIn(led, sl, "source", "v"))
    assert(collectLedger(folded) == collectLedger(full))
  }

  test("fold order does not matter (merge is associative + commutative)") {
    val df = rows.toDF("source", "v")
    val parts = (0 until 4).map(i =>
      StatsLedger.partial(df.filter(col("v") % 4 === i), "source", "v"))
    val leftFold = parts.reduceLeft(StatsLedger.merge)
    val shuffled = Seq(parts(2), parts(0), parts(3), parts(1))
      .reduceLeft(StatsLedger.merge)
    assert(collectLedger(leftFold) == collectLedger(shuffled))
  }

  test("folding into the empty ledger is the identity") {
    val df = rows.toDF("source", "v")
    val viaEmpty = StatsLedger.foldIn(StatsLedger.empty(spark), df, "source", "v")
    assert(collectLedger(viaEmpty) ==
      collectLedger(StatsLedger.partial(df, "source", "v")))
  }

  test("ledger survives a parquet state round-trip (readStateOr contract)") {
    val dir = java.nio.file.Files.createTempDirectory("ledger").toString + "/state"
    val df = rows.toDF("source", "v")
    val firstHalf = df.filter(col("v") % 2 === 0)
    val secondHalf = df.filter(col("v") % 2 === 1)
    StatsLedger.partial(firstHalf, "source", "v")
      .write.mode("overwrite").parquet(dir)
    val standing = Dedup.readStateOr(spark, dir, StatsLedger.empty(spark))
    val folded = StatsLedger.foldIn(standing, secondHalf, "source", "v")
    assert(collectLedger(folded) ==
      collectLedger(StatsLedger.partial(df, "source", "v")))
  }

  test("derived variance from the ledger matches direct computation") {
    val df = rows.toDF("source", "v")
    val led = StatsLedger.partial(df, "source", "v")
    // var = (sumsq - sum^2/n)/n, computed exactly in scaled integers:
    // n^2 * var_num = n*sumsq - sum^2
    val derived = led.select(col("key"),
        (col("n") * col("sumsq") - col("sum") * col("sum")).as("nsq_var"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = rows.groupBy(_._1).map { case (k, vs) =>
      val xs = vs.map(_._2)
      val n = xs.size.toLong
      val s = xs.sum
      k -> (n * xs.map(x => x * x).sum - s * s)
    }
    direct.foreach { case (k, v) =>
      assert(derived(k) == v, s"variance numerator mismatch for $k")
    }
  }
}
