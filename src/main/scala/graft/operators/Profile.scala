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
}
