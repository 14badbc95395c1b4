package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom-state sessionization via `flatMapGroupsWithState` — the
  * KeyValueGroupedDataset stateful-processing surface (SURVEY.md §2.10;
  * the declarative twin is StreamOps.sessionize's `session_window`).
  *
  * Semantics: per user, events within `gapMinutes` of inactivity extend
  * the open session; a larger gap closes it. Closed sessions are emitted
  * as soon as an in-batch gap reveals them; the still-open session is
  * buffered in [[SessionState]] and flushed when the event-time watermark
  * passes `last + gap` (EventTimeTimeout) — the standard late-data-safe
  * session shape. All event-time arithmetic is in MICROSECONDS
  * (`Timestamp.getTime` alone is millis and would truncate session
  * starts).
  */
object StatefulSessions extends Serializable {

  case class Ev(user_id: Long, ts: Timestamp, value: Double)
  case class SessionState(startUs: Long, lastUs: Long, n: Long, sum: Double)
  case class Session(user_id: Long, session_start: Timestamp,
                     n_events: Long, sum_value: Double)

  def microsOf(t: Timestamp): Long =
    math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  def tsOf(micros: Long): Timestamp = {
    val t = new Timestamp(math.floorDiv(micros, 1000000L) * 1000L)
    t.setNanos(((micros % 1000000L + 1000000L) % 1000000L).toInt * 1000)
    t
  }

  def sessionizeStateful(events: Dataset[Ev], gapMinutes: Int = 30)
      : Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes * 60000000L

    def emit(uid: Long, st: SessionState): Session =
      Session(uid, tsOf(st.startUs), st.n, st.sum)

    events
      .withWatermark("ts", s"$gapMinutes minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[Ev], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(emit(uid, _)).toSeq
            state.remove()
            out.iterator
          } else {
            val sorted = it.toSeq.sortBy(e => microsOf(e.ts))
            var open = state.getOption
            val closed = Seq.newBuilder[Session]
            sorted.foreach { e =>
              val t = microsOf(e.ts)
              open match {
                case Some(s) if t - s.lastUs < gapUs =>
                  open = Some(s.copy(lastUs = math.max(s.lastUs, t),
                    n = s.n + 1, sum = s.sum + e.value))
                case Some(s) =>
                  closed += emit(uid, s)
                  open = Some(SessionState(t, t, 1, e.value))
                case None =>
                  open = Some(SessionState(t, t, 1, e.value))
              }
            }
            open match {
              case Some(s) =>
                state.update(s)
                state.setTimeoutTimestamp((s.lastUs + gapUs) / 1000L)
              case None => state.remove()
            }
            closed.result().iterator
          }
      }
  }
}
