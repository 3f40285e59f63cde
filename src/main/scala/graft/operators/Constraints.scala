package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraints — the corpus-level gate a
  * 100 TB pipeline runs before shipping a release (the
  * per-record validation F-1 answers "is this row well-formed"; this
  * answers "is this TABLE internally consistent"). The standard
  * check vocabulary (uniqueness, referential integrity, not-null,
  * value ranges — the Deequ/expectations core) expressed as plain
  * aggregations, so every verdict is an exact integer count and the
  * whole suite hash-replays in SQL.
  *
  * Scale shape: uniqueness and not-null are one map-side-combined agg
  * per check; a foreign-key check is one left anti/null-probe join
  * (broadcast when the parent's key column is small, SMJ otherwise —
  * Catalyst's choice); checks are independent 1-row frames, so the
  * suite unions without a shuffle. Nothing is row-expanded.
  */
object Constraints {

  /** 1-row `(constraint, violations)`: rows whose `cols` tuple is
    * shared with at least one other row (total − distinct). */
  def unique(df: DataFrame, name: String, cols: String*): DataFrame =
    df.agg((count(lit(1)) -
        count_distinct(col(cols.head), cols.tail.map(col): _*))
      .as("violations"))
      .select(lit(name).as("constraint"), col("violations"))

  /** 1-row: rows where `c` is null. */
  def notNull(df: DataFrame, name: String, c: String): DataFrame =
    df.agg(sum(when(col(c).isNull, 1L).otherwise(0L)).as("violations"))
      .select(lit(name).as("constraint"),
        coalesce(col("violations"), lit(0L)).as("violations"))

  /** 1-row: rows where `c` falls outside `[lo, hi]` (nulls count —
    * an absent value cannot certify the range). */
  def inRange(df: DataFrame, name: String, c: String,
              lo: Column, hi: Column): DataFrame =
    inRange(df, name, col(c), lo, hi)

  /** Column-expression form of [[inRange]] — lets the caller grade a
    * derived value (e.g. the micro-grid rendering of a double) against
    * bounds expressed in the same domain. */
  def inRange(df: DataFrame, name: String, c: Column,
              lo: Column, hi: Column): DataFrame =
    df.agg(sum(when(c.isNull || c < lo || c > hi, 1L)
        .otherwise(0L)).as("violations"))
      .select(lit(name).as("constraint"),
        coalesce(col("violations"), lit(0L)).as("violations"))

  /** 1-row: child rows whose `fk` has no parent `pk` (null-probe left
    * join, so a NULL fk counts as a violation — same as the anti-join
    * reading, and replayable without NOT IN's null trap). */
  def foreignKey(child: DataFrame, name: String, fk: String,
                 parent: DataFrame, pk: String): DataFrame = {
    val p = parent.select(col(pk).as("__pk")).distinct()
    child.select(col(fk).as("__fk"))
      .join(p, col("__fk") === col("__pk"), "left")
      .agg(sum(when(col("__pk").isNull, 1L).otherwise(0L)).as("violations"))
      .select(lit(name).as("constraint"),
        coalesce(col("violations"), lit(0L)).as("violations"))
  }

  /** Union the checks into the suite report `(constraint, violations,
    * ok)` — each check is a 1-row frame, so this is a union of
    * scalars, not a shuffle. */
  def suite(checks: Seq[DataFrame]): DataFrame =
    checks.reduce(_ unionByName _)
      .select(col("constraint"), col("violations").cast("long"),
        (col("violations") === 0L).as("ok"))

  /** Deequ-style CONSTRAINT SUGGESTION (Schelter et al., VLDB 2018:
    * "Automating large-scale data quality verification"): profile the
    * BASELINE snapshot once, derive the constraints it satisfies —
    * not-null where no nulls, unique where distinct == rows, and for
    * declared numeric columns a [min, max] range — and evaluate them
    * against the CANDIDATE snapshot. This is the promote-gate loop:
    * yesterday's accepted drop defines the contract tomorrow's drop
    * must pass.
    *
    * The baseline profile is collect()ed to drive rule construction —
    * a columns-sized result (the model-sized-collect discipline), the
    * same place deequ materializes its column profiles. Each derived
    * rule is then one of the existing 1-row checks over the
    * candidate, so the evaluation cost is [[suite]]'s: a handful of
    * aggregations, each one scan-shuffle, unioned as scalars. */
  def suggestedSuite(baseline: DataFrame, candidate: DataFrame,
                     numericCols: Seq[String] = Nil): DataFrame = {
    val prof = Profile.tableProfile(baseline).collect()
    val checks = prof.toSeq.flatMap { r =>
      val c = r.getString(0)
      val (rows, nulls, distinct) = (r.getLong(1), r.getLong(2), r.getLong(3))
      val nn = if (nulls == 0L)
        Some(notNull(candidate, s"suggested:not_null:$c", c)) else None
      val un = if (distinct == rows)
        Some(unique(candidate, s"suggested:unique:$c", c)) else None
      // The profile renders min/max per TYPE (integral as-is, double/
      // float on the ×1e6 micro grid, timestamp as a formatted string)
      // — the derived range rule must grade the candidate in the SAME
      // domain, or micro-scaled bounds flag every raw double and
      // unparsable renders cast to null and silently pass.
      val rg = if (numericCols.contains(c)) {
        val lo = lit(r.getString(4)); val hi = lit(r.getString(5))
        import org.apache.spark.sql.types._
        baseline.schema(c).dataType match {
          case DoubleType | FloatType =>
            Some(inRange(candidate, s"suggested:range:$c",
              floor(col(c).cast("double") * 1e6 + 0.5).cast("long"),
              lo.cast("long"), hi.cast("long")))
          case ByteType | ShortType | IntegerType | LongType =>
            Some(inRange(candidate, s"suggested:range:$c", c,
              lo.cast("long"), hi.cast("long")))
          case dt: DecimalType =>
            Some(inRange(candidate, s"suggested:range:$c", c,
              lo.cast(dt), hi.cast(dt)))
          case other => throw new IllegalArgumentException(
            s"suggested:range:$c: non-numeric type $other — a profile " +
              "min/max rendered for this type has no range semantics")
        }
      } else None
      Seq(nn, un, rg).flatten
    }
    require(checks.nonEmpty, "baseline profile suggested no constraints")
    suite(checks)
  }
}
