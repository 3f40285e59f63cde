package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-time streaming analytics the reference approximates with its
  * processing-time lookbacks (SURVEY.md §2 T-2/T-4/T-6) — expressed
  * properly: watermarked tumbling windows for the freshness/volume
  * dashboards, and arbitrary keyed state (flatMapGroupsWithState) for
  * sessionization, the canonical custom-state operator.
  */
object WindowedStats {

  /** Tumbling-window counts per key with a watermark: the engine's
    * version of "how many articles per source per hour", tolerating
    * `lateness` of event-time disorder and evicting state past it.
    * Works identically on static frames (unit tests) and streams. */
  def windowedCounts(df: DataFrame, tsCol: String, keyCol: String,
                     windowLen: String = "1 hour",
                     lateness: String = "1 hour"): DataFrame =
    df.withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), windowLen), col(keyCol))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col(keyCol), col("n"))

  // ---- sessionization via arbitrary keyed state ------------------------

  case class Event(user_id: Long, ts: Timestamp, event_type: String)
  case class SessionState(start: Long, last: Long, n: Int)
  case class Session(user_id: Long, session_start: Timestamp,
                     session_end: Timestamp, n_events: Int)

  /** Epoch micros — full TimestampType precision (getTime alone drops
    * sub-ms and would mis-split gaps that straddle the threshold). */
  private def micros(t: Timestamp): Long =
    math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  /** Streaming gap-based sessionization: same semantics as
    * [[sessionize]], on an unbounded stream. Open sessions live in
    * keyed state; an event-time timeout (watermark passing
    * last + gap) closes them, so every session is emitted exactly
    * once and state stays bounded by the number of OPEN sessions. */
  def sessionizeStream(events: Dataset[Event], gapMs: Long,
                       lateness: String = "10 minutes"): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapUs = gapMs * 1000L
    events.withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, evs: Iterator[Event], state: GroupState[SessionState]) =>
          def toTs(us: Long) = new Timestamp(math.floorDiv(us, 1000L))
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(userId, toTs(s.start), toTs(s.last), s.n))
          } else {
            val sorted = evs.toSeq.sortBy(e => micros(e.ts))
            val out = scala.collection.mutable.ListBuffer[Session]()
            var st = state.getOption.orNull
            sorted.foreach { e =>
              val t = micros(e.ts)
              st match {
                case null => st = SessionState(t, t, 1)
                case s if t - s.last <= gapUs =>
                  st = SessionState(s.start, t, s.n + 1)
                case s =>
                  out += Session(userId, toTs(s.start), toTs(s.last), s.n)
                  st = SessionState(t, t, 1)
              }
            }
            if (st != null) {
              state.update(st)
              state.setTimeoutTimestamp(math.floorDiv(st.last + gapUs, 1000L))
            }
            out.iterator
          }
      }
  }

  /** Gap-based sessionization: events for a user belong to one session
    * while gaps stay under `gapMs`; a session closes when the gap is
    * exceeded (or, on a stream, on event-time timeout). The state per
    * key is three numbers — bounded regardless of corpus size. */
  def sessionize(events: Dataset[Event], gapMs: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapUs = gapMs * 1000L
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, evs: Iterator[Event], state: GroupState[SessionState]) =>
          val sorted = evs.toSeq.sortBy(e => micros(e.ts))
          val out = scala.collection.mutable.ListBuffer[Session]()
          def toTs(us: Long) = new Timestamp(math.floorDiv(us, 1000L))
          var st = state.getOption.orNull
          sorted.foreach { e =>
            val t = micros(e.ts)
            st match {
              case null => st = SessionState(t, t, 1)
              case s if t - s.last <= gapUs =>
                st = SessionState(s.start, t, s.n + 1)
              case s =>
                out += Session(userId, toTs(s.start), toTs(s.last), s.n)
                st = SessionState(t, t, 1)
            }
          }
          // batch mode: flush the open session; a stream would keep it
          // in state and close it via event-time timeout instead
          if (st != null && !state.hasTimedOut) {
            out += Session(userId, toTs(st.start), toTs(st.last), st.n)
            state.remove()
          } else if (st != null) {
            state.update(st)
          }
          out.iterator
      }
  }
}
