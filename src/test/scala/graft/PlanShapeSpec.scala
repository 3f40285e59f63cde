package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Physical-plan regression pins (round-12 VERDICT directive 5): the
  * load-bearing plan properties that earlier rounds verified by hand
  * with `.explain` — a refactor must not silently lose them. The
  * pattern follows IvfAtRestSpec's PartitionFilters proof: assert on
  * the PLANNED tree — the plan scan itself executes nothing, but the
  * whole-registry walk CONSTRUCTS every entry, and the ledger/
  * streaming surfaces run their scratch-dir batches eagerly at
  * construction time (intentional: they are designed for repeated
  * runs, Verify re-runs them every gate), so nothing is skipped and
  * the walk pays those construction-time batches.
  *
  * Pinned:
  *  - q04's anti-join build side broadcasts (BroadcastHashJoin
  *    LeftAnti — a SortMergeJoin here would shuffle the 100 TB probe
  *    side on content hash just to drop a few thousand rows);
  *  - q07/q19's ORDER BY + LIMIT fold into TakeOrderedAndProject (a
  *    global Sort + CollectLimit materializes the full sorted corpus);
  *  - q10's time-range predicate reaches the parquet scan as
  *    PushedFilters (a post-scan Filter reads the whole table);
  *  - NO CartesianProduct anywhere in the registry (the intentional
  *    single-row stats joins plan as BroadcastNestedLoopJoin, which
  *    is fine and distinct).
  */
class PlanShapeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** The planned tree as text, WITHOUT executing: for AQE roots take
    * the initial (statically planned) tree — the properties pinned
    * here are decided by the static planner from parquet size stats. */
  private def planString(df: DataFrame): String = {
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan.toString
      case p: SparkPlan => p.toString
    }
  }

  private def plan(name: String): String =
    planString(SparkEntry.queries(name)(spark, sf))

  test("q04 anti-join broadcasts its build side (BroadcastHashJoin LeftAnti)") {
    val p = plan("q04_anti_join")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      s"q04 lost its broadcast anti-join:\n$p")
  }

  test("q07/q19 top-k folds into TakeOrderedAndProject") {
    for (q <- Seq("q07_topk_recent", "q19_search_by_sentiment")) {
      val p = plan(q)
      assert(p.contains("TakeOrderedAndProject"),
        s"$q lost TakeOrderedAndProject:\n$p")
    }
  }

  test("q10 time-range predicate is pushed to the parquet scan") {
    val p = plan("q10_freshness_count")
    val pushed = "PushedFilters: \\[[^\\]]*(GreaterThan|LessThan|GreaterThanOrEqual|LessThanOrEqual|And\\()".r
    assert(pushed.findFirstIn(p).isDefined,
      s"q10's range predicate no longer reaches the scan:\n$p")
  }

  test("no CartesianProduct anywhere in the query registry") {
    // Whole-registry walk: every entry is constructed (the ledger/
    // streaming surfaces run their scratch-dir batches eagerly at
    // construction time — they are designed for repeated runs, Verify
    // re-runs them every gate) and its planned tree is scanned.
    val offenders = SparkEntry.queries.keys.toSeq.sorted
      .flatMap { name =>
        val p =
          try planString(SparkEntry.queries(name)(spark, sf))
          catch { case e: Throwable =>
            fail(s"$name failed to plan at $sf: ${e.getMessage}") }
        if (p.contains("CartesianProduct")) Some(name) else None
      }
    assert(offenders.isEmpty,
      s"CartesianProduct found in: ${offenders.mkString(", ")}")
  }
}
