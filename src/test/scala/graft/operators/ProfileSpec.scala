package graft.operators

import java.sql.Timestamp
import graft.SparkSpec

/** One-pass profiler: null/distinct accounting, per-type min/max
  * canonicalization, column selection. */
class ProfileSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (1L, Some("a"), Some(1.25), Some(Timestamp.valueOf("2024-01-02 03:04:05.123456"))),
    (2L, Some("b"), None, Some(Timestamp.valueOf("2024-01-02 03:04:05.123456"))),
    (3L, None, Some(-0.5), None),
    (4L, Some("b"), Some(2.0), Some(Timestamp.valueOf("2024-02-01 00:00:00")))
  ).toDF("id", "s", "v", "t")

  test("profile counts nulls and exact distincts per column") {
    val rows = Profile.tableProfile(df).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4),
          r.getString(5)))).toMap
    assert(rows("id") == ((4L, 0L, 4L, "1", "4")))
    assert(rows("s") == ((4L, 1L, 2L, "a", "b")))
    // doubles render micro-rounded: floor(-0.5e6 + 0.5) = -500000
    assert(rows("v") == ((4L, 1L, 3L, "-500000", "2000000")))
    assert(rows("t")._2 == 1L && rows("t")._3 == 2L)
    assert(rows("t")._4 == "2024-01-02 03:04:05.123456")
    assert(rows("t")._5 == "2024-02-01 00:00:00.000000")
  }

  test("column subset profiles only the named columns, sorted") {
    val got = Profile.tableProfile(df, Seq("v", "id")).collect()
      .map(_.getString(0)).toSeq
    assert(got == Seq("id", "v"))
  }

  test("profileDiff: added/removed/common statuses and change flags") {
    import spark.implicits._
    val v1 = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
      .toDF("id", "tag", "len")
    val v2 = Seq((1L, 10L, true), (2L, 99L, false))
      .toDF("id", "len", "keep")
    val got = Profile.profileDiff(v1, v2)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got("tag").getString(1) == "removed")
    assert(got("keep").getString(1) == "added")
    assert(got("id").getString(1) == "common")
    assert(got("id").getBoolean(8))        // max 3 → 2: minmax changed
    assert(got("len").getBoolean(8))       // 30 → 99
    assert(got("tag").isNullAt(8) && got("keep").isNullAt(8))
    assert(got("id").getLong(2) == 3L && got("id").getLong(3) == 2L)
  }

  test("profileDiff of identical frames reports nothing changed") {
    import spark.implicits._
    val v = Seq((1L, "x"), (2L, "y")).toDF("id", "s")
    val got = Profile.profileDiff(v, v).collect()
    assert(got.forall(_.getString(1) == "common"))
    assert(got.forall(!_.getBoolean(8)))
  }
}
