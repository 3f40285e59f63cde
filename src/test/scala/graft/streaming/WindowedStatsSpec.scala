package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import graft.SparkSpec
import WindowedStats.{Event, Session}

class WindowedStatsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("windowedCounts: tumbling hourly histogram per key") {
    val df = Seq(
      ("a", ts("2024-01-01 10:05:00")),
      ("a", ts("2024-01-01 10:55:00")),
      ("a", ts("2024-01-01 11:05:00")),
      ("b", ts("2024-01-01 10:30:00"))
    ).toDF("source_api", "fetched_at")
    val out = WindowedStats.windowedCounts(df, "fetched_at", "source_api")
      .collect().map(r => (r.getTimestamp(0).toString, r.getString(2), r.getLong(3))).toSet
    assert(out == Set(
      ("2024-01-01 10:00:00.0", "a", 2L),
      ("2024-01-01 11:00:00.0", "a", 1L),
      ("2024-01-01 10:00:00.0", "b", 1L)))
  }

  test("sessionize: gap splits sessions, state is per-user") {
    val events = Seq(
      Event(1L, ts("2024-01-01 10:00:00"), "view"),
      Event(1L, ts("2024-01-01 10:10:00"), "click"),
      Event(1L, ts("2024-01-01 12:00:00"), "view"),   // > 30min gap => new session
      Event(2L, ts("2024-01-01 10:05:00"), "view")
    ).toDS()
    val sessions = WindowedStats.sessionize(events, gapMs = 30 * 60 * 1000)
      .collect().sortBy(s => (s.user_id, s.session_start.getTime))
    assert(sessions.length == 3)
    assert(sessions(0) == Session(1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:10:00"), 2))
    assert(sessions(1) == Session(1L, ts("2024-01-01 12:00:00"), ts("2024-01-01 12:00:00"), 1))
    assert(sessions(2) == Session(2L, ts("2024-01-01 10:05:00"), ts("2024-01-01 10:05:00"), 1))
  }

  test("sessionizeStream closes sessions via event-time timeout") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[WindowedStats.Event]
    val q = WindowedStats.sessionizeStream(mem.toDS(), gapMs = 30 * 60 * 1000,
        lateness = "0 seconds")
      .writeStream.format("memory").queryName("graft_sessions")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: two events in one session
      mem.addData(
        WindowedStats.Event(1L, ts("2024-01-01 10:00:00"), "view"),
        WindowedStats.Event(1L, ts("2024-01-01 10:10:00"), "click"))
      q.processAllAvailable()
      assert(spark.table("graft_sessions").count() == 0) // still open
      // batch 2: event far past the gap advances the watermark AND
      // starts a new session; the old one must close via timeout
      mem.addData(WindowedStats.Event(1L, ts("2024-01-01 13:00:00"), "view"))
      q.processAllAvailable()
      mem.addData(WindowedStats.Event(2L, ts("2024-01-01 15:00:00"), "view"))
      q.processAllAvailable()
      val closed = spark.table("graft_sessions")
        .as[Session].collect().sortBy(_.session_start.getTime)
      assert(closed.exists(s =>
        s.user_id == 1L && s.n_events == 2 &&
        s.session_start == ts("2024-01-01 10:00:00") &&
        s.session_end == ts("2024-01-01 10:10:00")))
    } finally q.stop()
  }

  test("GraftExtensions injects native functions into a fresh session") {
    val orig = spark
    // getOrCreate only applies extensions at session creation — clear
    // the default so a genuinely new session (same SparkContext) forms
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      // (the spark.sql.extensions conf is static — only read when the
      // SparkContext forms — so the shared-context test goes through
      // the programmatic hook; spark-submit uses the conf form)
      val s2 = SparkSession.builder()
        .master("local[2]")
        .appName("graft-ext-test")
        .withExtensions(new graft.GraftExtensions)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      val r = s2.sql("SELECT vader_compound('The food here is good.') AS c").head()
      assert(math.abs(r.getDouble(0) - 0.4404) < 1e-9)
      // the sketch family: build the artifact in a SQL aggregate,
      // probe it with the scan-local codegen call — all in SQL
      val sk = s2.sql(
        """WITH toks(t) AS (VALUES ('alpha'), ('alpha'), ('beta')),
           art AS (SELECT cms_agg(t) AS a, bloom_agg(t) AS b FROM toks)
           SELECT cms_estimate(a, 'alpha') AS n,
                  bloom_contains(b, 'beta') AS inb,
                  bloom_contains(b, 'zzz') AS outb
           FROM art""").head()
      assert(sk.getLong(0) == 2L && sk.getBoolean(1) && !sk.getBoolean(2))
      // the documented 2-arg weighted form: cms_agg(key, weight)
      val wk = s2.sql(
        """WITH toks(t, w) AS (VALUES ('alpha', CAST(3 AS BIGINT)),
                                      ('alpha', CAST(4 AS BIGINT)),
                                      ('beta',  CAST(1 AS BIGINT))),
           art AS (SELECT cms_agg(t, w) AS a FROM toks)
           SELECT cms_estimate(a, 'alpha') AS n FROM art""").head()
      assert(wk.getLong(0) == 7L)
      // wrong arity fails analysis instead of silently dropping args
      assertThrows[Exception] {
        s2.sql("SELECT cms_agg('a', 1, 2) FROM VALUES (1)").head()
      }
    } finally {
      SparkSession.setDefaultSession(orig)
      SparkSession.setActiveSession(orig)
    }
  }
}
