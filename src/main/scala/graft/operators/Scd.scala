package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) builder — the warehouse
  * operation that turns a keyed CHANGE STREAM into versioned rows
  * with validity intervals (Kimball's SCD2), which is what the q111
  * time-travel reads and q44 as-of joins consume upstream.
  *
  * Deterministic by construction: events order by `(tsCol, tieCol)`
  * within each key, a version opens where the tracked attribute
  * differs from its predecessor (`lag`), closes at the next version's
  * open (`lead`, null = current), and the version number is a dense
  * count of change points. Pure window arithmetic over the key
  * partition — one shuffle on the key, no self-joins, no corpus
  * re-reads — and every output is an input value or a row count, so
  * the whole build hash-replays in SQL (q127).
  */
object Scd {

  /** Collapse a change stream to SCD2 rows
    * `(key, attr, valid_from, valid_to, version)`: one row per run of
    * equal consecutive `attrCol` values per `keyCol`; `valid_to` is
    * null on each key's current version. */
  def type2(events: DataFrame, keyCol: String, attrCol: String,
            tsCol: String, tieCol: String): DataFrame = {
    val byTs = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tieCol))
    val changed = events
      .select(col(keyCol), col(attrCol), col(tsCol), col(tieCol))
      .withColumn("__prev", lag(col(attrCol), 1).over(byTs))
      // a run opens at the key's first event or where the attr moved
      .filter(col("__prev").isNull || col("__prev") =!= col(attrCol))
      .drop("__prev")
    val byOpen = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tieCol))
    changed
      .withColumn("valid_to", lead(col(tsCol), 1).over(byOpen))
      .withColumn("version", row_number().over(byOpen).cast("long"))
      .select(col(keyCol), col(attrCol), col(tsCol).as("valid_from"),
        col("valid_to"), col("version"))
  }

  /** Snapshot diff — "what changed between corpus releases": one
    * FULL OUTER join of two keyed snapshots on `keyCol`, comparing a
    * content fingerprint column → `(key, status, fp_prev, fp_cur)`
    * with status ∈ added / removed / changed / unchanged.
    *
    * The fingerprint should be non-null for present rows (hash a
    * coalesced content column) so `IS NULL` cleanly means "absent on
    * that side". One shuffle on the key for equal-sized snapshots —
    * snapshots bucketed by the key diff with no shuffle at all. */
  def snapshotDiff(prev: DataFrame, cur: DataFrame, keyCol: String,
                   fpCol: String): DataFrame = {
    val p = prev.select(col(keyCol).as("key"), col(fpCol).as("fp_prev"))
    val c = cur.select(col(keyCol).as("key"), col(fpCol).as("fp_cur"))
    p.join(c, Seq("key"), "full_outer")
      .withColumn("status",
        when(col("fp_prev").isNull, "added")
          .when(col("fp_cur").isNull, "removed")
          .when(col("fp_prev") =!= col("fp_cur"), "changed")
          .otherwise("unchanged"))
      .select(col("key"), col("status"), col("fp_prev"), col("fp_cur"))
  }

  /** One row per status with its count — the release gate summary. */
  def diffSummary(diff: DataFrame): DataFrame =
    diff.groupBy(col("status")).agg(count(lit(1)).as("n"))
}
