package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def run(pts: Seq[(Long, Long)], ivs: Seq[(Long, Long, Long)],
                  w: Long): Set[(Long, Long)] =
    RangeJoin.pointInInterval(pts.toDF("pid", "p"), "p",
        ivs.toDF("iid", "s", "e"), "s", "e", w)
      .select(col("pid"), col("iid")).as[(Long, Long)].collect().toSet

  private def brute(pts: Seq[(Long, Long)],
                    ivs: Seq[(Long, Long, Long)]): Set[(Long, Long)] =
    (for { (pid, p) <- pts; (iid, s, e) <- ivs if s <= e && p >= s && p <= e }
      yield (pid, iid)).toSet

  test("matches brute force on a seeded corpus, all bin widths") {
    val rnd = new scala.util.Random(42)
    val pts = (1L to 200L).map(i => (i, rnd.nextLong(2000) - 1000L))
    val ivs = (1L to 80L).map { i =>
      val s = rnd.nextLong(2000) - 1000L
      (1000L + i, s, s + rnd.nextLong(50) - 5L) // some inverted (empty)
    }
    val expect = brute(pts, ivs)
    assert(expect.nonEmpty, "seed must produce matches")
    for (w <- Seq(1L, 4L, 64L, 1L << 40))
      assert(run(pts, ivs, w) == expect, s"binWidth=$w")
  }

  test("boundaries inclusive; no duplicates when an interval spans many bins") {
    val ivs = Seq((10L, 0L, 256L)) // spans 33 bins at w=8
    val pts = Seq((1L, 0L), (2L, 256L), (3L, -1L), (4L, 257L), (5L, 128L))
    val out = RangeJoin.pointInInterval(pts.toDF("pid", "p"), "p",
      ivs.toDF("iid", "s", "e"), "s", "e", 8L)
    val rows = out.select(col("pid"), col("iid")).as[(Long, Long)].collect()
    assert(rows.length == rows.distinct.length, "one row per match")
    assert(rows.map(_._1).toSet == Set(1L, 2L, 5L))
  }

  test("negative domain bins on floor boundaries (arithmetic shift)") {
    // a div-style truncation would merge bins around zero and miss these
    val ivs = Seq((1L, -16L, -9L), (2L, -8L, -1L))
    val pts = (-16L to -1L).map(p => (p, p))
    assert(run(pts, ivs, 8L) == brute(pts, ivs))
  }

  test("the plan is an equi-join, not a nested-loop product") {
    val pts = (1L to 50L).map(i => (i, i * 3)).toDF("pid", "p")
    val ivs = (1L to 20L).map(i => (100L + i, i * 5, i * 5 + 9)).toDF("iid", "s", "e")
    val plan = RangeJoin.pointInInterval(pts, "p", ivs, "s", "e", 8L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  private def bruteOverlap(as: Seq[(Long, Long, Long)],
                           bs: Seq[(Long, Long, Long)]): Set[(Long, Long)] =
    (for { (aid, as1, ae) <- as; (bid, bs1, be) <- bs
           if as1 <= ae && bs1 <= be && as1 <= be && bs1 <= ae }
      yield (aid, bid)).toSet

  test("intervalOverlap matches brute force, no duplicate pairs, all widths") {
    val rnd = new scala.util.Random(7)
    def mk(n: Int, base: Long) = (1 to n).map { i =>
      val s = rnd.nextLong(2000) - 1000L
      (base + i, s, s + rnd.nextLong(60) - 5L) // some inverted (empty)
    }
    val as = mk(120, 0L); val bs = mk(90, 10000L)
    val expect = bruteOverlap(as, bs)
    assert(expect.nonEmpty, "seed must produce overlaps")
    for (w <- Seq(1L, 8L, 64L, 1L << 40)) {
      val rows = RangeJoin.intervalOverlap(
          as.toDF("aid", "as1", "ae"), "as1", "ae",
          bs.toDF("bid", "bs1", "be"), "bs1", "be", w)
        .select(col("aid"), col("bid")).as[(Long, Long)].collect()
      assert(rows.length == rows.distinct.length, s"dup pairs at binWidth=$w")
      assert(rows.toSet == expect, s"binWidth=$w")
    }
  }

  test("intervalOverlap: touching endpoints match; disjoint do not") {
    val as = Seq((1L, 0L, 10L)); val bs = Seq((2L, 10L, 20L), (3L, 11L, 20L))
    val rows = RangeJoin.intervalOverlap(
        as.toDF("aid", "as1", "ae"), "as1", "ae",
        bs.toDF("bid", "bs1", "be"), "bs1", "be", 8L)
      .select(col("aid"), col("bid")).as[(Long, Long)].collect().toSet
    assert(rows == Set((1L, 2L)))
  }

  test("intervalOverlap plan is an equi-join, not a nested-loop product") {
    val as = (1L to 40L).map(i => (i, i * 3, i * 3 + 10)).toDF("aid", "as1", "ae")
    val bs = (1L to 20L).map(i => (100L + i, i * 5, i * 5 + 9)).toDF("bid", "bs1", "be")
    val plan = RangeJoin.intervalOverlap(as, "as1", "ae", bs, "bs1", "be", 8L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("guards: power-of-two width, disjoint column names") {
    val pts = Seq((1L, 1L)).toDF("pid", "p")
    val ivs = Seq((2L, 0L, 2L)).toDF("iid", "s", "e")
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(pts, "p", ivs, "s", "e", 12L)
    }
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(pts, "p",
        Seq((2L, 0L, 2L)).toDF("pid", "s", "e"), "s", "e", 8L)
    }
  }
}
