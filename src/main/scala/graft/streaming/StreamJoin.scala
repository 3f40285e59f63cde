package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream joins with bounded state — the streaming analog of
  * the batch lookback/as-of joins ([[graft.operators.AsOfJoin]]).
  *
  * Structured Streaming's canonical interval join: both sides carry
  * event-time watermarks, and the join condition bounds how far apart
  * matching rows may be, so each side's buffered state is
  * (rows/second × (lookback + allowed lateness)) — constant per key
  * regardless of stream age. Without the time-range conjunct the
  * state would grow without bound; Spark rejects such joins in
  * append mode for exactly that reason.
  */
object StreamJoin {

  /** Interval join: rows of `left` matched with `right` rows of the
    * same key whose time falls in [leftTime − lookback, leftTime].
    * Key columns must be distinct names (rename before calling); both
    * inputs may be streaming. `delay` is the max event lateness either
    * side tolerates before its state is evicted.
    *
    * `joinType` "inner" (default) or "left_outer": outer emits the
    * unmatched left row with nulls once the watermark passes the point
    * where a match could still arrive — so outer results are delayed
    * by (lookback + delay), the price of a correct "no match ever"
    * verdict on an unbounded stream. */
  def intervalJoin(left: DataFrame, right: DataFrame,
                   leftKey: String, rightKey: String,
                   leftTime: String, rightTime: String,
                   lookback: String, delay: String,
                   joinType: String = "inner"): DataFrame = {
    val l = left.withWatermark(leftTime, delay)
    val r = right.withWatermark(rightTime, delay)
    l.join(r,
      col(leftKey) === col(rightKey) &&
        col(rightTime) >= col(leftTime) - expr(s"INTERVAL $lookback") &&
        col(rightTime) <= col(leftTime),
      joinType)
  }
}
