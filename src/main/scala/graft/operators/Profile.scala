package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One-pass table profiler — the ANALYZE-style data-quality report a
  * pipeline runs before trusting a new drop: per column, row/null
  * counts, exact distinct cardinality, and canonicalized min/max.
  *
  * Scale shape: ONE aggregation over one scan, no per-column passes.
  * The multiple exact `count_distinct`s plan through Catalyst's Expand
  * (input rows fan out ×columns before the partial aggregate) — linear
  * in columns, still a single shuffle of grouped partials, and the
  * right trade for a profile that must be exact. For
  * quick-look profiles at the 100 TB end swap `count_distinct` for the
  * HLL ledger ([[Sketch.hllDistinct]]) — same report shape.
  *
  * Min/max render deterministically per type so the report is
  * hash-comparable across engines (the DuckDB-parity disciplines):
  * integral/string as-is, DOUBLE micro-rounded, TIMESTAMP formatted to
  * fixed 6-digit microseconds.
  */
object Profile {

  private def renderMinMax(c: String, dt: DataType) = dt match {
    case _: TimestampType =>
      (date_format(min(col(c)), "yyyy-MM-dd HH:mm:ss.SSSSSS"),
       date_format(max(col(c)), "yyyy-MM-dd HH:mm:ss.SSSSSS"))
    case _: DoubleType | _: FloatType =>
      (floor(min(col(c)) * 1e6 + 0.5).cast("long").cast("string"),
       floor(max(col(c)) * 1e6 + 0.5).cast("long").cast("string"))
    case _ =>
      (min(col(c)).cast("string"), max(col(c)).cast("string"))
  }

  /** Profile `cols` (default: every column) of `df`. Output one row
    * per column: (column, n_rows, n_nulls, n_distinct, min_s, max_s),
    * sorted by column name. */
  def tableProfile(df: DataFrame, cols: Seq[String] = Nil): DataFrame = {
    val names = if (cols.nonEmpty) cols else df.columns.toSeq
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    val aggs = names.flatMap { c =>
      val (mn, mx) = renderMinMax(c, types(c))
      Seq(count(col(c)).as(s"__nn_$c"),
        count_distinct(col(c)).as(s"__nd_$c"),
        mn.as(s"__mn_$c"), mx.as(s"__mx_$c"))
    }
    val one = df.agg(count(lit(1)).as("__rows"), aggs: _*)
    val branches = names.map { c =>
      s"'$c', __rows - `__nn_$c`, `__nd_$c`, `__mn_$c`, `__mx_$c`"
    }.mkString(", ")
    one.select(col("__rows").as("n_rows"),
        expr(s"stack(${names.size}, $branches)")
          .as(Seq("column", "n_nulls", "n_distinct", "min_s", "max_s")))
      .select(col("column"), col("n_rows"), col("n_nulls"),
        col("n_distinct"), col("min_s"), col("max_s"))
      .orderBy(col("column"))
  }

  /** Release-over-release PROFILE diff — the schema/stats twin of
    * [[Scd.snapshotDiff]]'s row-level compare: profile both versions
    * ([[tableProfile]], one aggregation each) and full-outer join on
    * the column name, so a column added or dropped between versions
    * surfaces as schema drift and a surviving column carries its
    * before/after stats side by side with a min/max-changed flag.
    * This is the "did the new drop change shape" gate a pipeline runs
    * before promoting a snapshot — cheap at any scale because each
    * side is one profile pass and the join is columns-sized. */
  def profileDiff(a: DataFrame, b: DataFrame,
                  colsA: Seq[String] = Nil,
                  colsB: Seq[String] = Nil): DataFrame = {
    val pa = tableProfile(a, colsA).select(col("column"),
      col("n_rows").as("rows_a"), col("n_nulls").as("nulls_a"),
      col("n_distinct").as("distinct_a"),
      col("min_s").as("min_a"), col("max_s").as("max_a"))
    val pb = tableProfile(b, colsB).select(col("column"),
      col("n_rows").as("rows_b"), col("n_nulls").as("nulls_b"),
      col("n_distinct").as("distinct_b"),
      col("min_s").as("min_b"), col("max_s").as("max_b"))
    pa.join(pb, Seq("column"), "full")
      .select(col("column"),
        when(col("rows_a").isNull, "added")
          .when(col("rows_b").isNull, "removed")
          .otherwise("common").as("status"),
        col("rows_a"), col("rows_b"),
        col("nulls_a"), col("nulls_b"),
        col("distinct_a"), col("distinct_b"),
        when(col("rows_a").isNull || col("rows_b").isNull, lit(null))
          .otherwise(col("min_a") =!= col("min_b") ||
            col("max_a") =!= col("max_b")).as("minmax_changed"))
  }

  /** Robust per-group outlier detection (the Hampel filter): flag
    * rows whose integer `valCol` deviates from the GROUP median by
    * more than 3 group-MADs. Mean/stddev outlier tests break on the
    * outliers themselves (one giant doc inflates σ until nothing
    * flags); median/MAD have a 50% breakdown point.
    *
    * EXACT integer arithmetic throughout — the doubled-median trick:
    * `med2` = x₍ₖ₎+x₍ₖ₊₁₎ (even n) or 2·x₍ₖ₎ (odd), an integer;
    * per-row deviation `dev2 = |2x − med2|` (2x-units); `mad4` =
    * doubled median of dev2 (4x-units); the Hampel test
    * |x−med| > 3·MAD becomes `2·dev2 > 3·mad4` with no division or
    * float anywhere, so the verdict is order-free and replays
    * bit-for-bit in the oracle.
    *
    * Scale shape: two windowed order-statistics passes, both
    * partitioned BY GROUP (no global sort); output is the flagged
    * rows. Groups are assumed executor-sized (sources/domains —
    * the q52 cardinality class), the usual window contract. */
  def madOutliers(df: DataFrame, groupCol: String, idCol: String,
                  valCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def med2Of(frame: DataFrame, v: String, out: String): DataFrame = {
      val w = Window.partitionBy(col(groupCol)).orderBy(col(v))
      val g = Window.partitionBy(col(groupCol))
      frame
        .withColumn("__rn", row_number().over(w))
        .withColumn("__n", count(lit(1)).over(g))
        .withColumn("__lo", expr("(__n + 1) div 2"))
        .withColumn("__hi", expr("(__n + 2) div 2"))
        .withColumn(out,
          sum(when(col("__rn") === col("__lo"), col(v)).otherwise(0L)
            + when(col("__rn") === col("__hi"), col(v)).otherwise(0L))
            .over(g))
        .drop("__rn", "__n", "__lo", "__hi")
    }
    val v = col(valCol).cast("long")
    val withMed = med2Of(df.select(col(groupCol), col(idCol),
      v.as("__v")), "__v", "med2")
    val withDev = withMed.withColumn("dev2",
      abs(lit(2L) * col("__v") - col("med2")))
    val withMad = med2Of(withDev, "dev2", "mad4")
    withMad
      .filter(lit(2L) * col("dev2") > lit(3L) * col("mad4"))
      .select(col(groupCol), col(idCol), col("__v").as(valCol),
        col("med2"), col("dev2"), col("mad4"))
  }
}
