package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stream-health monitoring beyond the reference's boolean freshness
  * watchdog (T-6, check_data_freshness): anomaly detection on the
  * event volume itself — the "did ingest spike or stall" question
  * every pipeline dashboard asks next.
  *
  * The classic test (count > μ + kσ over a trailing window) is a
  * float z-score; here it is rearranged into INTEGER arithmetic so
  * the verdict is exact, order-free, and oracle-replayable:
  *
  *   cnt > μ + kσ   ⟺   n·cnt − S > 0  ∧  (n·cnt − S)² > k²·(n·Q − S²)
  *
  * with S = Σcnt, Q = Σcnt² over the n trailing hours (n²σ² = n·Q −
  * S², both sides multiplied by n²). Counts are bounded by ingest
  * rate, so the squares stay far under 2^63 (cnt ≤ ~3·10⁹ per hour
  * before (n·cnt−S)² can wrap with n=24).
  *
  * The trailing frame runs over the GAP-FILLED hour spine (`sequence`
  * per key, missing hours count 0 — the q110 densification), because
  * a row-frame over observed rows silently stretches across gaps and
  * under-reacts exactly when something stalled.
  *
  * Scale shape: one map-side-combined groupBy to hourly counts, one
  * spine explode (keys × hours, tiny), one window partitioned BY KEY
  * — no global window, no corpus shuffle beyond the hourly rollup.
  */
object Monitoring {

  /** Hourly volume spikes per `keyCol`: `(key, hour, cnt, is_gap,
    * spike)` over the gap-filled spine; `spike` is the exact integer
    * k-sigma test against the `trailingHours` preceding hours and is
    * only awarded once a full trailing window exists (n =
    * trailingHours — a half-grown baseline flags everything). */
  def hourlySpikes(events: DataFrame, keyCol: String, tsCol: String,
                   trailingHours: Int = 24, k: Int = 3): DataFrame = {
    val hourly = events
      .select(col(keyCol).as("key"), date_trunc("hour", col(tsCol)).as("hour"))
      .groupBy(col("key"), col("hour")).agg(count(lit(1)).as("n_events"))
    val spine = hourly.groupBy(col("key"))
      .agg(min(col("hour")).as("mn"), max(col("hour")).as("mx"))
      .select(col("key"),
        explode(expr("sequence(mn, mx, interval 1 hour)")).as("hour"))
    val dense = spine.join(hourly, Seq("key", "hour"), "left")
      .select(col("key"), col("hour"),
        coalesce(col("n_events"), lit(0L)).as("cnt"),
        col("n_events").isNull.as("is_gap"))
    val trail = Window.partitionBy(col("key")).orderBy(col("hour"))
      .rowsBetween(-trailingHours, -1)
    val n = count(lit(1)).over(trail)
    val s = sum(col("cnt")).over(trail)
    val q = sum(col("cnt") * col("cnt")).over(trail)
    val dev = n * col("cnt") - s            // n·(cnt − μ)
    val varN2 = n * q - s * s               // n²·σ²
    dense.withColumn("spike",
      n === trailingHours.toLong && dev > 0L &&
        dev * dev > lit(k.toLong * k) * varN2)
  }

  /** ES PIPELINE AGGREGATIONS over the gap-filled hourly histogram —
    * the second-pass aggs that consume bucket values rather than
    * documents: `cumulative_sum`, `derivative` (null on each key's
    * first bucket, ES semantics), `moving_fn` average over the
    * `movWindow` PRECEDING buckets (only once the window is full),
    * and a `bucket_script` ratio of a flagged sub-count to the bucket
    * count. Counts and the spine are integer-exact; the two ratios
    * take one double division each, micro-rounded. Same scale shape
    * as [[hourlySpikes]]: hourly rollup, tiny spine, one per-key
    * window. */
  def pipelineAggs(events: DataFrame, keyCol: String, tsCol: String,
                   flag: Column, movWindow: Int = 3): DataFrame = {
    val hourly = events
      .select(col(keyCol).as("key"),
        date_trunc("hour", col(tsCol)).as("hour"), flag.as("__f"))
      .groupBy(col("key"), col("hour"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("__f"), 1L).otherwise(0L)).as("n_flag"))
    val spine = hourly.groupBy(col("key"))
      .agg(min(col("hour")).as("mn"), max(col("hour")).as("mx"))
      .select(col("key"),
        explode(expr("sequence(mn, mx, interval 1 hour)")).as("hour"))
    val dense = spine.join(hourly, Seq("key", "hour"), "left")
      .select(col("key"), col("hour"),
        coalesce(col("n_events"), lit(0L)).as("cnt"),
        coalesce(col("n_flag"), lit(0L)).as("flagged"))
    val w = Window.partitionBy(col("key")).orderBy(col("hour"))
    val cumW = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val movW = w.rowsBetween(-movWindow, -1)
    dense
      .withColumn("cum", sum(col("cnt")).over(cumW))
      .withColumn("deriv", col("cnt") - lag(col("cnt"), 1).over(w))
      .withColumn("mov_avg_micro",
        when(count(lit(1)).over(movW) === movWindow.toLong,
          floor(sum(col("cnt")).over(movW).cast("double")
            / lit(movWindow.toDouble) * 1e6 + 0.5).cast("long")))
      .withColumn("rate_micro",
        when(col("cnt") > 0L,
          floor(col("flagged").cast("double") / col("cnt").cast("double")
            * 1e6 + 0.5).cast("long")))
  }

  /** ES composite-aggregation pagination (the `after` cursor): one
    * page of `size` buckets from a bucket frame, strictly AFTER the
    * cursor key in the composite (lexicographic multi-key) order.
    * This is how ES pages unbounded bucket spaces — and the only
    * shape that survives scale: the keyset predicate prunes BEFORE
    * the sort, so each page is a TakeOrderedAndProject over only the
    * remaining keys, where an OFFSET pager re-sorts (and re-skips)
    * everything before the cursor on every page. On a layout sorted/
    * bucketed by the key columns the predicate becomes a range scan.
    *
    * `afterKey` values are literal strings compared against the key
    * columns via a struct comparison (Spark) / row-value comparison
    * (SQL) — callers render non-string keys (hours, dates) to
    * canonical strings first, exactly like ES's `after` echo. Bucket
    * keys are unique by construction (they come from a groupBy), so
    * the page is deterministic with no tiebreak column. */
  def compositePage(buckets: DataFrame, keyCols: Seq[String],
                    afterKey: Option[Seq[String]], size: Int): DataFrame = {
    require(afterKey.forall(_.length == keyCols.length),
      "afterKey arity must match keyCols")
    val paged = afterKey match {
      case Some(vals) =>
        buckets.filter(struct(keyCols.map(col): _*) >
          struct(vals.map(lit): _*))
      case None => buckets
    }
    paged.orderBy(keyCols.map(col): _*).limit(size)
  }

  /** ES `percentile_ranks` (the inverse of q39's percentiles): for
    * each requested value, the fraction of the key's observations at
    * or below it. Exact — conditional counts in ONE map-side-combined
    * groupBy (no sort, no sketch; the forward direction needs the
    * sketch, the inverse is just counting), one double division per
    * (key, value) on the micro grid. Output: `(key, value, n,
    * n_le, rank_micro)`, one row per key × requested value. */
  def percentileRanks(df: DataFrame, keyCol: String, valCol: String,
                      at: Seq[Double]): DataFrame = {
    require(at.nonEmpty, "need at least one value")
    val aggs = at.zipWithIndex.flatMap { case (x, i) =>
      Seq(sum(when(col(valCol) <= x, 1L).otherwise(0L)).as(s"__le$i"))
    } :+ count(lit(1)).as("__n")
    val g = df.groupBy(col(keyCol).as("key"))
      .agg(aggs.head, aggs.tail: _*)
      .localCheckpoint() // keys-sized; consumed once per requested value
    val rows = at.zipWithIndex.map { case (x, i) =>
      g.select(col("key"), lit(x).as("value"), col("__n").as("n"),
        col(s"__le$i").as("n_le"),
        floor(col(s"__le$i").cast("double") / col("__n")
          * 1000000.0 + 0.5).cast("long").as("rank_micro"))
    }
    rows.reduce(_ unionByName _)
  }
}
