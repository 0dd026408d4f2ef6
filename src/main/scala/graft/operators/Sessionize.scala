package graft.operators

import graft.functions.Canonical
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
    val gapMs = Canonical.epochMs(col("ts")) - Canonical.epochMs(lag(col("ts"), 1).over(w))
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
        min(Canonical.epochMs(col("ts"))).as("start_ms"),
        max(Canonical.epochMs(col("ts"))).as("end_ms"),
        sum(expr("CAST(round(value * 100) AS BIGINT)")).as("value_cents"))
      .withColumn("duration_ms", (col("end_ms") - col("start_ms")).cast(LongType))

  /** First-touch attribution: every session is credited to the
    * `event_type` of its FIRST event (the session's acquisition
    * "channel"), and purchases inside the session roll up to that
    * channel. The channel is computed on the SAME running user window
    * that numbers the sessions — `last(ignoreNulls)` over the
    * session-start marks carries the opening event_type forward — so
    * attribution adds zero exchanges to [[assign]]; the per-channel
    * rollup then aggregates a |sessions|-sized relation, never the raw
    * log.
    *
    * Output: (channel, n_sessions, n_purchases, purchase_cents),
    * purchase value in canonical cents (integral partial sums).
    */
  def attribution(events: DataFrame, gapSeconds: Long = 1800L): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gapMs = Canonical.epochMs(col("ts")) - Canonical.epochMs(lag(col("ts"), 1).over(w))
    val isPurchase = col("event_type") === "purchase"
    events
      .withColumn("__new",
        when(gapMs.isNull || gapMs > gapSeconds * 1000L, 1L).otherwise(0L))
      .withColumn("session_seq", sum(col("__new")).over(run))
      .withColumn("channel",
        last(when(col("__new") === 1L, col("event_type")), ignoreNulls = true)
          .over(run))
      .groupBy("user_id", "session_seq")
      .agg(
        min(col("channel")).as("channel"),
        sum(when(isPurchase, 1L).otherwise(0L)).as("__purch"),
        sum(when(isPurchase, expr("CAST(round(value * 100) AS BIGINT)"))
          .otherwise(0L)).as("__cents"))
      .groupBy("channel")
      .agg(
        count(lit(1)).as("n_sessions"),
        sum(col("__purch")).as("n_purchases"),
        sum(col("__cents")).as("purchase_cents"))
  }
}
