package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SCD2: equal-attribute runs collapse to one version, intervals
  * chain with no gaps, the current version stays open, and the build
  * is deterministic under repartition. */
class ScdSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int): java.sql.Timestamp =
    java.sql.Timestamp.from(
      java.time.Instant.parse("2026-02-01T00:00:00Z").plusSeconds(m * 60L))

  // user 1: a→a→b→b→a (3 versions); user 2: x only (1 version)
  private lazy val ev = Seq(
    (1L, "a", ts(0), 100L), (1L, "a", ts(1), 101L),
    (1L, "b", ts(2), 102L), (1L, "b", ts(3), 103L),
    (1L, "a", ts(4), 104L),
    (2L, "x", ts(0), 200L))
    .toDF("user_id", "event_type", "ts", "event_id")

  private def collectScd(df: org.apache.spark.sql.DataFrame) =
    Scd.type2(df, "user_id", "event_type", "ts", "event_id")
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getTimestamp(2), Option(r.getTimestamp(3)), r.getLong(4)))
      .sortBy(t => (t._1, t._5))

  test("runs collapse to versions; intervals chain; current is open") {
    val rows = collectScd(ev)
    assert(rows.map(t => (t._1, t._2, t._5)).toSeq ==
      Seq((1L, "a", 1L), (1L, "b", 2L), (1L, "a", 3L), (2L, "x", 1L)))
    val u1 = rows.filter(_._1 == 1L)
    // each version closes exactly where the next opens
    assert(u1(0)._4.contains(u1(1)._3) && u1(1)._4.contains(u1(2)._3))
    // the last version per key is open-ended
    assert(u1(2)._4.isEmpty && rows.last._4.isEmpty)
    assert(u1(0)._3 == ts(0) && u1(1)._3 == ts(2) && u1(2)._3 == ts(4))
  }

  test("same-timestamp ties resolve by the tiebreak column") {
    val tied = Seq(
      (1L, "a", ts(0), 2L), (1L, "b", ts(0), 1L)) // b first by event_id
      .toDF("user_id", "event_type", "ts", "event_id")
    val rows = collectScd(tied)
    assert(rows.map(t => (t._2, t._5)).toSeq == Seq(("b", 1L), ("a", 2L)))
  }

  test("deterministic under repartition") {
    assert(collectScd(ev).toSeq == collectScd(ev.repartition(5)).toSeq)
  }

  test("snapshotDiff classifies all four statuses; summary counts them") {
    val prev = Seq((1L, "h1"), (2L, "h2"), (3L, "h3")).toDF("id", "fp")
    val cur = Seq((1L, "h1"), (2L, "h2x"), (4L, "h4")).toDF("id", "fp")
    val diff = Scd.snapshotDiff(prev, cur, "id", "fp")
    val byKey = diff.collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byKey == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added"))
    val sum = Scd.diffSummary(diff).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sum == Map("unchanged" -> 1L, "changed" -> 1L,
      "removed" -> 1L, "added" -> 1L))
  }
}
