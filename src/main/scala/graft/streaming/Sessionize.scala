package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful event-time processing (SURVEY.md §2.10's Spark-side upgrade:
  * the reference has no cross-block state; Structured Streaming adds
  * watermarked windows and keyed state). Sessionization with
  * `flatMapGroupsWithState`: a session closes when `gapMs` passes with
  * no event (tracked by event-time timeout against the watermark), so
  * results are deterministic under replay — late data beyond the
  * watermark is dropped by the engine, not by us. */
object Sessionize {

  final case class Ev(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class SessionState(startUs: Long, endUs: Long, n: Int, sum: Double)
  final case class Session(
      user_id: Long, start_us: Long, end_us: Long, n_events: Int, sum_value: Double)

  /** Append-mode sessions: input must already carry a watermark on `ts`
    * (`withWatermark`) at least as large as the session gap. */
  def sessions(events: Dataset[Ev], gapMs: Long): Dataset[Session] = {
    implicit val sessEnc = Encoders.product[Session]
    implicit val stateEnc = Encoders.product[SessionState]
    implicit val longEnc = Encoders.scalaLong
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, evs: Iterator[Ev], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // gap elapsed past the watermark → close and emit
            val s = state.get
            state.remove()
            Iterator(Session(userId, s.startUs, s.endUs, s.n, s.sum))
          } else {
            val sorted = evs.toSeq.sortBy(_.ts.getTime)
            var cur = state.getOption
            val closed = Seq.newBuilder[Session]
            sorted.foreach { e =>
              val us = e.ts.getTime * 1000L
              cur match {
                case Some(s) if us - s.endUs <= gapMs * 1000L =>
                  cur = Some(SessionState(s.startUs, math.max(s.endUs, us),
                    s.n + 1, s.sum + e.value))
                case Some(s) => // gap inside the batch → close previous
                  closed += Session(userId, s.startUs, s.endUs, s.n, s.sum)
                  cur = Some(SessionState(us, us, 1, e.value))
                case None =>
                  cur = Some(SessionState(us, us, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // wake when the gap has fully elapsed in event time
              state.setTimeoutTimestamp(s.endUs / 1000L + gapMs)
            }
            closed.result().iterator
          }
      }
  }
}
