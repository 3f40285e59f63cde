package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private val quotes = Seq(
    ("a", 10L, 1.0), ("a", 20L, 2.0), ("a", 30L, 3.0),
    ("b", 15L, 9.0)).toDF("k", "t", "px")
  private val trades = Seq(
    ("a", 5L), ("a", 20L), ("a", 25L), ("b", 14L), ("c", 50L))
    .toDF("k", "t")

  test("attaches the latest right value at or before each left time") {
    val out = AsOfJoin.asof(trades, quotes, "k", "t", "t",
        Seq("px" -> col("px")))
      .as[(String, Long, Option[Double])].collect().toSet
    assert(out == Set(
      ("a", 5L, None),          // nothing at or before t=5
      ("a", 20L, Some(2.0)),    // simultaneous quote matches (<=)
      ("a", 25L, Some(2.0)),    // latest prior, not latest overall
      ("b", 14L, None),
      ("c", 50L, None)))        // key absent from right side
  }

  test("equal-time right rows: tiebreak picks the last deterministically") {
    val dup = Seq(("a", 10L, 1.0, 1L), ("a", 10L, 7.0, 2L))
      .toDF("k", "t", "px", "seq")
    val out = AsOfJoin.asof(Seq(("a", 11L)).toDF("k", "t"), dup,
        "k", "t", "t", Seq("px" -> col("px")),
        rightTiebreak = Some(col("seq")))
      .select("px").as[Double].collect().toSeq
    assert(out == Seq(7.0))
  }

  test("properties: left-preserving, and attached time never exceeds left time") {
    val rnd = new scala.util.Random(7)
    val left = Seq.tabulate(300)(i =>
      (s"k${rnd.nextInt(10)}", rnd.nextInt(1000).toLong, i.toLong))
      .toDF("k", "t", "lid")
    val right = Seq.tabulate(300)(i =>
      (s"k${rnd.nextInt(12)}", rnd.nextInt(1000).toLong, i.toLong))
      .toDF("k", "t", "rid")
    val out = AsOfJoin.asof(left, right, "k", "t", "t",
      Seq("rt" -> col("t")), rightTiebreak = Some(col("rid")))
    assert(out.count() == 300) // exactly one output row per left row
    assert(out.filter(col("rt") > col("t")).isEmpty) // as-of, never future
    // every attached time is the max right time <= left time for the key
    val best = right.groupBy(col("k").as("bk"), col("t").as("bt"))
      .count().drop("count")
    val viol = out.filter(col("rt").isNotNull)
      .join(best, col("k") === col("bk") &&
        col("bt") <= col("t") && col("bt") > col("rt"))
    assert(viol.isEmpty)
  }
}
