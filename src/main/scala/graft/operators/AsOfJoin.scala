package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-prior) join — the time-series operator Spark
  * lacks natively, composed from existing ops per the custom-operator
  * preference order (compose > custom plan): for each left row, attach
  * the latest right row with the same key and `rightTime <= leftTime`.
  *
  * Implementation is the scalable union+window form: tag both sides,
  * union, and carry the last non-null right value forward over a
  * (key, time) window. ONE shuffle on the key — the minimum any
  * key-partitioned temporal join needs — versus the naive correlated
  * subquery (a per-row scan) or an inequality join (which Spark plans
  * as a broadcast nested loop). At 100 TB both sides hash-partition by
  * key and sort within partitions — the same movement as any key join;
  * skewed keys split via AQE like any other shuffle.
  *
  * Tie semantics match DuckDB/pandas ASOF: a right row AT the left
  * timestamp matches (<=); among equal-time right rows the last in
  * (time, tiebreak) order wins, so pass a unique `rightTiebreak` for
  * determinism when right times can collide.
  */
object AsOfJoin {

  /** For every row of `left`: all left columns plus, for each
    * (name, col) in `rightVals`, the value from the matching as-of row
    * of `right` (null when no right row precedes it). `leftTime` /
    * `rightTime` must be mutually comparable (use the exact int64
    * nanos column, not a truncated derivation, when both exist). */
  def asof(left: DataFrame, right: DataFrame, key: String,
           leftTime: String, rightTime: String,
           rightVals: Seq[(String, Column)],
           rightTiebreak: Option[Column] = None): DataFrame = {
    val valNames = rightVals.map(_._1)
    val leftCols = left.columns.toSeq
    // withColumn REPLACES an existing column of the same name — a
    // collision would silently null out left-side data instead of
    // failing, so reject it up front (reserved names included).
    val reserved = Seq("__t", "__side", "__tie")
    val collisions = (valNames ++ reserved).filter(leftCols.contains)
    require(collisions.isEmpty,
      s"asof: output/reserved names collide with left columns: " +
        collisions.mkString(", "))
    require(valNames.distinct.size == valNames.size,
      s"asof: duplicate rightVals names: " +
        valNames.diff(valNames.distinct).distinct.mkString(", "))
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .withColumn("__tie", lit(null).cast("long"))
    val lPadded = valNames.foldLeft(l)((df, n) =>
      df.withColumn(n, lit(null)))
    // evaluate the value expressions against the ORIGINAL right frame
    // (before rightTime is renamed away), then project to shape
    val r0 = rightVals.foldLeft(right)((df, nv) =>
      df.withColumn("__v_" + nv._1, nv._2))
    val r = r0.select(Seq(col(key), col(rightTime).as("__t"),
      lit(0).as("__side"),
      rightTiebreak.getOrElse(lit(0L)).cast("long").as("__tie")) ++
      valNames.map(n => col("__v_" + n).as(n)): _*)
    val rPadded = leftCols.filterNot(c => c == key || r.columns.contains(c))
      .foldLeft(r)((df, c) => df.withColumn(c, lit(null)))
    // right rows sort BEFORE the left row at equal time (side 0 < 1),
    // so an exactly-simultaneous right row is visible to the left row.
    val w = Window.partitionBy(col(key))
      .orderBy(col("__t"), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = valNames.foldLeft(lPadded.unionByName(rPadded)) {
      (df, n) => df.withColumn(n, last(col(n), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1)
      .select((leftCols.map(col) ++ valNames.map(col)): _*)
  }
}
