package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Volume-anomaly watchdog: a planted burst is flagged, the steady
  * baseline is not, nothing is flagged before a full trailing
  * window exists, and stalled hours surface as gaps. */
class MonitoringSpec extends SparkSpec {
  import spark.implicits._

  private def at(hour: Int): java.sql.Timestamp =
    java.sql.Timestamp.from(
      java.time.Instant.parse("2026-01-01T00:00:00Z")
        .plusSeconds(hour * 3600L))

  // 100 hours of steady 10-events/hour; hour 50 bursts to 100;
  // hours 60-62 stall entirely
  private lazy val events = (0 until 100).flatMap { h =>
    val n = h match {
      case 50 => 100
      case 60 | 61 | 62 => 0
      case _ => 10
    }
    (0 until n).map(i => ("ingest", at(h), i.toLong))
  }.toDF("event_type", "ts", "i")

  private lazy val out = Monitoring
    .hourlySpikes(events, "event_type", "ts", trailingHours = 24, k = 3)
    .select(col("hour"), col("cnt"), col("is_gap"), col("spike"))
    .collect()
    .map(r => (r.getTimestamp(0).toInstant.getEpochSecond, r.getLong(1),
      r.getBoolean(2), r.getBoolean(3)))
    .sortBy(_._1)

  private def hourOf(epoch: Long): Int =
    ((epoch - at(0).toInstant.getEpochSecond) / 3600L).toInt

  test("the planted burst is flagged, the steady baseline is not") {
    val spikes = out.filter(_._4).map(t => hourOf(t._1)).toSet
    assert(spikes == Set(50), s"flagged hours: $spikes")
  }

  test("no verdict before a full trailing window exists") {
    // even a burst at hour 3 must not flag (baseline too short):
    val early = (0 until 10).map(i => ("ingest", at(3), i.toLong))
      .toDF("event_type", "ts", "i")
      .union((0 until 500).map(i => ("ingest", at(2), i.toLong))
        .toDF("event_type", "ts", "i"))
    val flagged = Monitoring
      .hourlySpikes(early, "event_type", "ts", trailingHours = 24, k = 3)
      .filter(col("spike")).count()
    assert(flagged == 0L)
  }

  test("stalled hours surface as zero-count gaps") {
    val gaps = out.filter(_._3).map(t => hourOf(t._1)).toSet
    assert(gaps == Set(60, 61, 62), s"gap hours: $gaps")
    assert(out.filter(t => gaps.contains(hourOf(t._1))).forall(_._2 == 0L))
  }

  test("verdicts are partitioning-invariant") {
    val a = Monitoring.hourlySpikes(events, "event_type", "ts")
      .select("hour", "spike").collect().map(r =>
        (r.getTimestamp(0).getTime, r.getBoolean(1))).toSet
    val b = Monitoring.hourlySpikes(events.repartition(13), "event_type", "ts")
      .select("hour", "spike").collect().map(r =>
        (r.getTimestamp(0).getTime, r.getBoolean(1))).toSet
    assert(a == b)
  }

  test("pipelineAggs: cum/derivative/moving-avg/bucket-script, gaps filled") {
    // hours 0..4 with counts 4, 2, GAP, 6, 1; flagged = value ≥ 10
    // planted as 2, 1, 0, 3, 0
    val ev = Seq(
      (0, 4, 2), (1, 2, 1), (3, 6, 3), (4, 1, 0)
    ).flatMap { case (h, n, f) =>
      (0 until n).map(i => ("k", at(h), if (i < f) 10.0 else 1.0))
    }.toDF("event_type", "ts", "value")
    val rows = Monitoring.pipelineAggs(ev, "event_type", "ts",
        flag = col("value") >= 10.0, movWindow = 3)
      .orderBy(col("hour")).collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getLong(4),
        Option(r.get(5)).map(_.asInstanceOf[Long]),
        Option(r.get(6)).map(_.asInstanceOf[Long]),
        Option(r.get(7)).map(_.asInstanceOf[Long])))
    // (cnt, flagged, cum, deriv, mov_avg_micro, rate_micro)
    assert(rows.toSeq == Seq(
      (4L, 2L, 4L, None, None, Some(500000L)),
      (2L, 1L, 6L, Some(-2L), None, Some(500000L)),
      (0L, 0L, 6L, Some(-2L), None, None),              // the gap hour
      (6L, 3L, 12L, Some(6L), Some(2000000L), Some(500000L)),
      (1L, 0L, 13L, Some(-5L),
        Some(math.floor((2 + 0 + 6) / 3.0 * 1e6 + 0.5).toLong),
        Some(0L))))
  }

  test("pipelineAggs: randomized sparse hours match a Scala replay (3 seeds)") {
    for (seed <- Seq(37, 79, 131)) {
      val rnd = new scala.util.Random(seed)
      // sparse, gappy hourly counts on one key; first event per
      // observed hour carries the flag value
      val perHour = (0 until 30).map(h =>
        h -> (if (rnd.nextBoolean()) rnd.nextInt(6) else 0))
        .filter(_._2 > 0)
      val ev = perHour.flatMap { case (h, n) =>
        (0 until n).map(j => ("k", at(h), if (j == 0) 99.0 else 1.0))
      }.toDF("event_type", "ts", "value")
      val byHour = perHour.toMap
      val lo = perHour.map(_._1).min; val hi = perHour.map(_._1).max
      val counts = (lo to hi).map(h => byHour.getOrElse(h, 0))
      val flags = (lo to hi).map(h => if (byHour.contains(h)) 1 else 0)
      val want = counts.indices.map { i =>
        val cnt = counts(i).toLong
        val cum = counts.take(i + 1).sum.toLong
        val deriv = if (i == 0) None else Some(cnt - counts(i - 1).toLong)
        val win = (math.max(0, i - 3) until i).map(counts)
        val mov = if (i >= 3)
          Some(math.floor(win.sum.toDouble / 3.0 * 1e6 + 0.5).toLong)
        else None
        val rate = if (cnt > 0)
          Some(math.floor(flags(i).toDouble / cnt.toDouble * 1e6 + 0.5).toLong)
        else None
        (cnt, cum, deriv, mov, rate)
      }
      val got = Monitoring.pipelineAggs(ev, "event_type", "ts",
          flag = col("value") >= 99.0, movWindow = 3)
        .orderBy(col("hour")).collect().map(r =>
          (r.getLong(2), r.getLong(4),
            Option(r.get(5)).map(_.asInstanceOf[Long]),
            Option(r.get(6)).map(_.asInstanceOf[Long]),
            Option(r.get(7)).map(_.asInstanceOf[Long])))
      assert(got.toSeq == want, s"seed $seed")
    }
  }

  test("percentileRanks == brute force; edges at 0 and 1 (3 seeds)") {
    import spark.implicits._
    def micro(x: Double): Long = math.floor(x * 1e6 + 0.5).toLong
    for (seed <- Seq(67L, 256L, 1234L)) {
      val rows = (0 until 500).map { i =>
        (s"k${i % 3}", math.abs((i * 2654435761L + seed) % 400).toDouble)
      }
      val at = Seq(0.0, 75.0, 200.0, 399.0)
      val got = Monitoring.percentileRanks(rows.toDF("event_type", "value"),
          "event_type", "value", at)
        .as[(String, Double, Long, Long, Long)].collect().toSet
      val want = (for {
        (k, rs) <- rows.groupBy(_._1); x <- at
      } yield {
        val nle = rs.count(_._2 <= x).toLong
        (k, x, rs.size.toLong, nle, micro(nle.toDouble / rs.size))
      }).toSet
      assert(got == want, s"seed $seed")
    }
    // a value above every observation ranks 1.0; below every, 0.0
    val tiny = Seq(("a", 5.0), ("a", 6.0)).toDF("event_type", "value")
    val r = Monitoring.percentileRanks(tiny, "event_type", "value",
        Seq(1.0, 100.0))
      .as[(String, Double, Long, Long, Long)].collect()
      .map(t => t._2 -> t._5).toMap
    assert(r(1.0) == 0L && r(100.0) == 1000000L)
  }
}
