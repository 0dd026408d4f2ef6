package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Gap-based sessionization — the event-stream operator every behavioral
  * pipeline needs (and the reference's per-table run grouping is a
  * degenerate case of: `step3_run_syncdiff.sh:157-166` groups artifacts
  * into "runs" by timestamp gaps between directories).
  *
  * A session is a maximal run of a user's events where consecutive gaps
  * stay within `gapSeconds`. The standard two-window encoding: lag() finds
  * each gap, a boolean marks session starts, and a running sum turns the
  * marks into a per-user session sequence number.
  *
  * Scale posture: ONE shuffle on the user key + one in-partition sort
  * serves both windows AND the downstream per-session aggregate (grouping
  * by (user, session_seq) is satisfied by the user-hash partitioning, so
  * `sessions` adds no second exchange — partial aggregation combines
  * map-side). No self-join, no range join, no candidate blowup; a 100 TB
  * event log sessionizes at shuffle speed.
  */
object Sessionize {

  /** Per-event session assignment: (user_id, session_seq) identifies the
    * session; session_seq starts at 1 per user. Tie order within a user
    * is (ts, event_id) — total and deterministic.
    */
  def assign(events: DataFrame, gapSeconds: Long = 1800L): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gapMs = unix_millis(col("ts")) - unix_millis(lag(col("ts"), 1).over(w))
    events
      .withColumn("__new",
        when(gapMs.isNull || gapMs > gapSeconds * 1000L, 1L).otherwise(0L))
      .withColumn("session_seq", sum(col("__new")).over(run))
      .drop("__new")
  }

  /** Per-session rollup over `assign`: bounds, size, and the session's
    * value total in canonical cents (integral — partial sums re-combine
    * exactly; see the float-parity posture in `Canonical`).
    */
  def sessions(events: DataFrame, gapSeconds: Long = 1800L): DataFrame =
    assign(events, gapSeconds)
      .groupBy("user_id", "session_seq")
      .agg(
        count(lit(1)).as("n_events"),
        min(unix_millis(col("ts"))).as("start_ms"),
        max(unix_millis(col("ts"))).as("end_ms"),
        sum(expr("CAST(round(value * 100) AS BIGINT)")).as("value_cents"))
      .withColumn("duration_ms", (col("end_ms") - col("start_ms")).cast(LongType))
}
