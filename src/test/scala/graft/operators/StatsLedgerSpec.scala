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

  // ---- histogram ledger ----------------------------------------------

  test("histogram fold-in equals one-shot; bins are bit-lengths") {
    val df = rows.toDF("source", "v")
    val full = StatsLedger.histPartial(df, "source", "v")
    val slices = (0 until 3).map(i => df.filter(col("v") % 3 === i))
    val folded = slices.map(StatsLedger.histPartial(_, "source", "v"))
      .reduce(StatsLedger.histMerge)
    def norm(d: DataFrame) = d.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(norm(folded) == norm(full))
    // reference bins: bit-length of v (v=0 -> bin 0)
    val expect = rows.groupBy(_._1).flatMap { case (k, vs) =>
      vs.groupBy { case (_, v) =>
        if (v <= 0L) 0L else (64 - java.lang.Long.numberOfLeadingZeros(v)).toLong
      }.map { case (bin, xs) => (k, bin, xs.size.toLong) }
    }.toSet
    assert(norm(full) == expect)
  }

  test("percentile bands bracket the true percentiles") {
    val df = rows.toDF("source", "v")
    val bands = StatsLedger.histPercentiles(
      StatsLedger.histPartial(df, "source", "v"), Seq(50, 90, 99))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    rows.groupBy(_._1).foreach { case (k, vs) =>
      val sortedVs = vs.map(_._2).sorted
      Seq(50, 90, 99).foreach { p =>
        // true p-th percentile: smallest x with rank(x)*100 >= p*n
        val idx = (p.toLong * sortedVs.size + 99) / 100 - 1
        val truth = sortedVs(math.max(0, idx.toInt))
        val (_, lo, hi) = bands((k, p.toLong))
        assert(truth >= lo && truth <= hi,
          s"$k p$p: true $truth outside band [$lo, $hi]")
      }
    }
  }
}

/** Bounded-state heavy hitters ([[TopKLedger]]): truncation-merge
  * laws and the classic exactness guarantee for dominant tokens. */
class TopKLedgerSpec extends SparkSpec {
  import spark.implicits._

  // token streams with a known dominant structure: "hot" appears in
  // every doc 3 times, "warm-i" tokens rotate, tail tokens unique
  private val docs: Seq[(Long, String, Seq[String])] =
    (1L to 120L).map { i =>
      val toks = Seq("hot", "hot", "hot", s"warm${i % 4}", s"warm${i % 4}",
        s"tail-$i")
      (i, s"g${i % 2}", toks)
    }

  private def norm(d: org.apache.spark.sql.DataFrame) =
    d.select("key", "rank", "token", "cnt").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .toSet

  test("dominant tokens keep EXACT counts through truncation-merge") {
    val df = docs.toDF("doc_id", "key", "toks")
    val parts = (0 until 3).map(i =>
      TopKLedger.partial(df.filter(col("doc_id") % 3 === i), "key",
        col("toks"), m = 8))
    val merged = parts.reduceLeft((a, b) => TopKLedger.merge(a, b, m = 8))
    val top = TopKLedger.topK(merged, k = 3).collect()
      .map(r => (r.getString(0), r.getString(2)) -> r.getLong(3)).toMap
    // "hot": 3 per doc, 60 docs per key -> exactly 180, rank 1 in both
    assert(top(("g0", "hot")) == 180L && top(("g1", "hot")) == 180L)
  }

  test("truncation-merge never overcounts (lower-bound semantics)") {
    val df = docs.toDF("doc_id", "key", "toks")
    val exact = df.select(col("key"), explode(col("toks")).as("token"))
      .groupBy("key", "token").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val parts = (0 until 3).map(i =>
      TopKLedger.partial(df.filter(col("doc_id") % 3 === i), "key",
        col("toks"), m = 4))
    val merged = parts.reduceLeft((a, b) => TopKLedger.merge(a, b, m = 4))
    merged.collect().foreach { r =>
      val k = (r.getString(0), r.getString(1))
      assert(r.getLong(2) <= exact(k), s"overcount for $k")
    }
  }

  test("with m >= vocabulary, the fold is exact and order-free") {
    val df = docs.toDF("doc_id", "key", "toks")
    val exactTop = TopKLedger.topK(
      TopKLedger.partial(df, "key", col("toks"), m = 1000), k = 5)
    val parts = (0 until 3).map(i =>
      TopKLedger.partial(df.filter(col("doc_id") % 3 === i), "key",
        col("toks"), m = 1000))
    val foldedA = TopKLedger.topK(
      parts.reduceLeft((a, b) => TopKLedger.merge(a, b, m = 1000)), k = 5)
    val foldedB = TopKLedger.topK(
      Seq(parts(2), parts(0), parts(1))
        .reduceLeft((a, b) => TopKLedger.merge(a, b, m = 1000)), k = 5)
    assert(norm(foldedA) == norm(exactTop))
    assert(norm(foldedB) == norm(exactTop))
  }
}
