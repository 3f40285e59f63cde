package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The data-quality gate counts exactly the planted violations. */
class ConstraintsSpec extends SparkSpec {
  import spark.implicits._

  test("each check counts its planted violations exactly") {
    val child = Seq((1L, Some(10L)), (2L, Some(10L)), (2L, Some(11L)),
        (3L, Some(99L)), (4L, None))
      .toDF("id", "fk")
    val parent = Seq(10L, 11L).toDF("pk")
    val vals = Seq(Some(1L), Some(50L), Some(0L), Some(51L), None)
      .toDF("v")
    val named = Seq(Some("a"), None, Some("c")).toDF("name")
    val out = Constraints.suite(Seq(
        Constraints.unique(child, "unique:id", "id"),
        Constraints.foreignKey(child, "fk:fk->pk", "fk", parent, "pk"),
        Constraints.inRange(vals, "range:v[1,50]", "v", lit(1L), lit(50L)),
        Constraints.notNull(named, "notnull:name", "name")))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2)))
      .toMap
    // id=2 appears twice → 5 rows, 4 distinct → 1 violation
    assert(out("unique:id") == (1L, false))
    // fk 99 orphaned + null fk → 2
    assert(out("fk:fk->pk") == (2L, false))
    // 0, 51, and null → 3
    assert(out("range:v[1,50]") == (3L, false))
    assert(out("notnull:name") == (1L, false))
  }

  test("a clean table passes every check") {
    val t = Seq((1L, "x"), (2L, "y")).toDF("id", "name")
    val out = Constraints.suite(Seq(
        Constraints.unique(t, "u", "id"),
        Constraints.notNull(t, "n", "name"),
        Constraints.inRange(t, "r", "id", lit(1L), lit(2L)),
        Constraints.foreignKey(t, "f", "id", t, "id")))
      .collect()
    assert(out.forall(r => r.getLong(1) == 0L && r.getBoolean(2)))
  }

  test("suggestion derives exactly the rules the baseline satisfies") {
    import spark.implicits._
    // id: unique+not-null+range; tag: not-null only (dups); note: has
    // a null → NO not-null rule, and its distinct<rows → no unique
    val base = Seq((1L, "a", Some("x")), (2L, "a", None), (3L, "b", Some("x")))
      .toDF("id", "tag", "note")
    val out = Constraints.suggestedSuite(base, base, numericCols = Seq("id"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2)))
      .toMap
    assert(out.keySet == Set("suggested:not_null:id", "suggested:unique:id",
      "suggested:range:id", "suggested:not_null:tag"))
    assert(out.values.forall(v => v._1 == 0L && v._2)) // self passes
  }

  test("the suggested contract catches the candidate's regressions") {
    import spark.implicits._
    val base = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("id", "len")
    val cand = Seq((1L, 10L), (1L, 25L), (4L, 99L)).toDF("id", "len")
    val out = Constraints.suggestedSuite(base, cand,
        numericCols = Seq("id", "len"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("suggested:unique:id") == 1L)  // duplicated 1
    assert(out("suggested:range:id") == 1L)   // 4 > max 3
    assert(out("suggested:range:len") == 1L)  // 99 > max 30
    assert(out("suggested:not_null:id") == 0L)
  }

  test("a suggested range over a DOUBLE column grades on the micro grid") {
    import spark.implicits._
    // the profile renders double min/max ×1e6 — the derived rule must
    // compare candidates in that same domain, not raw-vs-scaled
    val base = Seq((1L, 0.25), (2L, 0.75), (3L, 0.50)).toDF("id", "score")
    val cand = Seq((4L, 0.25), (5L, 0.75), (6L, 0.80), (7L, 0.10))
      .toDF("id", "score")
    val out = Constraints.suggestedSuite(base, cand,
        numericCols = Seq("score"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 0.80 > max 0.75 and 0.10 < min 0.25; the boundary values pass
    assert(out("suggested:range:score") == 2L)
    // and a baseline self-check is violation-free (the exactness
    // property the micro grid buys: boundary equality survives)
    val self = Constraints.suggestedSuite(base, base,
        numericCols = Seq("score"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(self("suggested:range:score") == 0L)
  }

  test("a suggested range over a non-numeric column fails fast") {
    import spark.implicits._
    val base = Seq((1L, "a")).toDF("id", "tag")
    intercept[IllegalArgumentException] {
      Constraints.suggestedSuite(base, base, numericCols = Seq("tag"))
    }
  }
}
