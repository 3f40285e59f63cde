package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.AsOfJoin

/** The custom as-of physical operator: plans through AsOfJoinExec,
  * matches the composed union+window form row for row, honors the
  * tie/no-match contract, and survives self-sourced inputs and
  * arbitrary input partitioning. */
class AsOfExecSpec extends SparkSpec {
  import spark.implicits._

  private val trades = Seq(
    (1L, 100L, 10L), (1L, 105L, 11L), (1L, 200L, 12L),
    (2L, 50L, 20L), (3L, 7L, 30L)
  ).toDF("user_id", "t", "trade")

  private val quotes = Seq(
    (1L, 100L, 900L),  // tie at t=100 must match trade@100
    (1L, 104L, 901L), (1L, 300L, 902L),
    (2L, 60L, 903L)    // after trade@50: no match for user 2
  ).toDF("q_user", "q_t", "q_px")

  private def run(l: org.apache.spark.sql.DataFrame,
                  r: org.apache.spark.sql.DataFrame) =
    AsOfJoinPhysical.asofExec(l, r, "user_id", "q_user", "t", "q_t")
      .select($"user_id", $"t", $"q_t", $"q_px")
      .as[(Long, Long, Option[Long], Option[Long])].collect().toSet

  test("plans through AsOfJoinExec and matches hand-computed answers") {
    val df = AsOfJoinPhysical.asofExec(trades, quotes,
      "user_id", "q_user", "t", "q_t")
    // AQE wraps the plan; the node (nodeName "AsOfJoin") shows in the
    // plan string either way
    assert(df.queryExecution.executedPlan.toString.contains("AsOfJoin"),
      "custom exec not planned")
    assert(run(trades, quotes) == Set(
      (1L, 100L, Some(100L), Some(900L)),   // tie: <= includes
      (1L, 105L, Some(104L), Some(901L)),   // latest prior wins
      (1L, 200L, Some(104L), Some(901L)),   // future quote ignored
      (2L, 50L, None, None),                // only future quotes
      (3L, 7L, None, None)))                // no quotes at all
  }

  test("agrees with the composed union+window AsOfJoin form") {
    val composed = AsOfJoin.asof(trades, quotes.withColumnRenamed("q_user", "user_id")
        .withColumnRenamed("q_t", "t"), "user_id", "t", "t",
      Seq("px" -> col("q_px")))
      .select($"user_id", $"t", $"px")
      .as[(Long, Long, Option[Long])].collect().toSet
    val exec = run(trades, quotes).map { case (u, t, _, px) => (u, t, px) }
    assert(exec == composed)
  }

  test("self-sourced sides get fresh expression ids") {
    val ev = Seq((1L, "p", 10L, 5L), (1L, "c", 8L, 6L), (1L, "c", 3L, 7L),
      (2L, "p", 4L, 8L)).toDF("user_id", "kind", "ts", "v")
    val l = ev.filter($"kind" === "p").select($"user_id", $"ts", $"v")
    val r = ev.filter($"kind" === "c").select($"user_id".as("r_user"),
      $"ts".as("r_ts"), $"v".as("r_v"))
    val got = AsOfJoinPhysical.asofExec(l, r, "user_id", "r_user", "ts", "r_ts")
      .select($"user_id", $"ts", $"r_v")
      .as[(Long, Long, Option[Long])].collect().toSet
    assert(got == Set((1L, 10L, Some(6L)), (2L, 4L, None)))
  }

  test("answer is partitioning-invariant") {
    assert(run(trades.repartition(7), quotes.repartition(3)) ==
      run(trades.coalesce(1), quotes.coalesce(1)))
  }

  test("randomized: exec == plain-Scala as-of on dup-heavy data (3 seeds)") {
    for (seed <- Seq(13, 59, 101)) {
      val rnd = new scala.util.Random(seed)
      // small key/time domains force duplicate times and empty keys
      val lRows = (1 to 120).map(_ =>
        (rnd.nextInt(6).toLong, rnd.nextInt(30).toLong, rnd.nextInt(100).toLong))
      // unique right (key, time) — the determinism precondition
      val rRows = (1 to 80).map(_ =>
        (rnd.nextInt(8).toLong, rnd.nextInt(30).toLong))
        .distinct.map { case (k, t) => (k, t, k * 1000 + t) }
      val l = lRows.toDF("user_id", "t", "trade")
      val r = rRows.toDF("q_user", "q_t", "q_px")
      val want = lRows.map { case (k, t, _) =>
        val best = rRows.filter(p => p._1 == k && p._2 <= t)
          .sortBy(_._2).lastOption
        (k, t, best.map(_._2), best.map(_._3))
      }
      val got = AsOfJoinPhysical.asofExec(l, r, "user_id", "q_user", "t", "q_t")
        .select($"user_id", $"t", $"q_t", $"q_px")
        .as[(Long, Long, Option[Long], Option[Long])].collect()
      // multiset compare: left rows can repeat
      assert(got.sorted.toSeq == want.sorted.toSeq, s"seed $seed")
    }
  }
}
