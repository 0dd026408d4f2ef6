package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming face of [[graft.operators.Sessionize]]: gap-based sessions
  * over a live event stream via flatMapGroupsWithState with EVENT-time
  * timeout — the watermark, not wall clock, closes sessions, so replaying
  * history yields byte-identical sessions to the live run (and to the
  * batch operator, which is what the spec asserts).
  *
  * State is ONE open session per user (bounded by |active users|, evicted
  * on timeout); each micro-batch folds its rows into the open session or
  * closes it and opens the next. A closed session is emitted exactly
  * once. Session numbering restarts per state lifetime — downstream joins
  * key on (user_id, start_ms), which is stable across batch and stream.
  */
object StreamingSessions {

  /** Typed input row: (user_id, epoch ms, canonical cents). */
  case class Ev(user_id: Long, ts_ms: Long, cents: Long)

  case class OpenSession(startMs: Long, lastMs: Long, n: Long, cents: Long)

  case class ClosedSession(user_id: Long, start_ms: Long, end_ms: Long,
                           n_events: Long, value_cents: Long)

  /** Sessionize a streaming (or batch-tested via MemoryStream) events
    * relation carrying `ts` (timestamp), `user_id`, `value`. `watermark`
    * bounds late data; sessions close when the watermark passes the last
    * event + gap.
    */
  def sessionize(events: DataFrame, gapSeconds: Long,
                 watermark: String): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    val gapMs = gapSeconds * 1000L
    // the watermarked `ts` column must survive UNTOUCHED to the stateful
    // operator (a typed map would sever the event-time attribute and fail
    // the EventTimeTimeout analysis check) — convert to millis inside the
    // state function instead
    events.withWatermark("ts", watermark)
      .select(col("user_id"), col("ts"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .as[(Long, java.sql.Timestamp, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, raw: Iterator[(Long, java.sql.Timestamp, Long)],
         state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(ClosedSession(user, s.startMs, s.lastMs, s.n, s.cents))
          } else {
            val sorted = raw.map { case (u, ts, c) => Ev(u, ts.getTime, c) }
              .toSeq.sortBy(e => (e.ts_ms, e.cents))
            val closed = Seq.newBuilder[ClosedSession]
            var open = state.getOption
            sorted.foreach { e =>
              open = open match {
                case Some(s) if e.ts_ms - s.lastMs <= gapMs =>
                  Some(OpenSession(s.startMs, e.ts_ms, s.n + 1, s.cents + e.cents))
                case Some(s) =>
                  closed += ClosedSession(user, s.startMs, s.lastMs, s.n, s.cents)
                  Some(OpenSession(e.ts_ms, e.ts_ms, 1L, e.cents))
                case None =>
                  Some(OpenSession(e.ts_ms, e.ts_ms, 1L, e.cents))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastMs + gapMs)
            }
            closed.result().iterator
          }
      }
  }
}
