package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

case class Click(cuser: String, cts: Timestamp, click_id: Long)
case class Purchase(puser: String, pts: Timestamp, purchase_id: Long)

/** Stream-stream interval join semantics over MemoryStream
  * micro-batches: matches within the lookback window only, state
  * bounded by watermark + range (the append-mode requirement). */
class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("interval join matches only clicks within the lookback window") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Click]
    val purchases = MemoryStream[Purchase]

    clicks.addData(
      Click("u1", ts("2024-01-01 10:00:00"), 1L),  // 30 min before -> match
      Click("u1", ts("2024-01-01 08:00:00"), 2L),  // 2.5 h before  -> outside lookback
      Click("u2", ts("2024-01-01 10:20:00"), 3L),  // other user    -> match u2 only
      Click("u1", ts("2024-01-01 11:00:00"), 4L))  // AFTER purchase -> no match
    purchases.addData(
      Purchase("u1", ts("2024-01-01 10:30:00"), 100L),
      Purchase("u2", ts("2024-01-01 10:30:00"), 200L),
      Purchase("u3", ts("2024-01-01 10:30:00"), 300L)) // no clicks at all

    val joined = StreamJoin.intervalJoin(
      purchases.toDF(), clicks.toDF(),
      "puser", "cuser", "pts", "cts",
      lookback = "1 HOUR", delay = "10 MINUTES")
    assert(joined.isStreaming)

    val q = joined.writeStream.format("memory")
      .queryName("sj_out").outputMode("append").start()
    q.processAllAvailable()
    q.stop()

    val out = spark.table("sj_out")
      .select($"purchase_id", $"click_id").as[(Long, Long)].collect().toSet
    assert(out == Set((100L, 1L), (200L, 3L)))
  }

  test("left-outer emits no-match rows once the watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Click]
    val purchases = MemoryStream[Purchase]

    clicks.addData(Click("u1", ts("2024-01-01 10:00:00"), 1L))
    purchases.addData(
      Purchase("u1", ts("2024-01-01 10:30:00"), 100L),
      Purchase("u9", ts("2024-01-01 10:30:00"), 900L)) // no click ever

    val joined = StreamJoin.intervalJoin(
      purchases.toDF(), clicks.toDF(),
      "puser", "cuser", "pts", "cts",
      lookback = "1 HOUR", delay = "10 MINUTES", joinType = "left_outer")

    val q = joined.writeStream.format("memory")
      .queryName("sj_outer").outputMode("append").start()
    q.processAllAvailable()
    // advance both watermarks far past u9's match window
    clicks.addData(Click("u1", ts("2024-01-01 13:00:00"), 5L))
    purchases.addData(Purchase("u1", ts("2024-01-01 13:00:00"), 101L))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("sj_outer")
      .select($"purchase_id", $"click_id").collect()
      .map(r => (r.getLong(0), Option(r.get(1)))).toSet
    assert(out.contains((100L, Some(1L))))
    assert(out.contains((900L, None))) // verdict only after watermark passed
  }
}
