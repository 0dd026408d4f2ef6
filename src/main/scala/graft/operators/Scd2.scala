package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD-2 interval build — change-data-capture over an append-only event
  * log: collapse each user's consecutive same-state events into versioned
  * validity intervals `[valid_from, valid_to)`, the open (valid_to NULL)
  * interval being the current state.
  *
  * This is the dimension-table face of the reference's replica-drift
  * problem (SURVEY.md §2.10): a downstream that applies these intervals at
  * time T must equal the upstream's as-of-T snapshot — the same
  * snapshot-pinned semantics S6 expresses as `AS OF TIMESTAMP`.
  *
  * Scale posture: one shuffle. The lag/run-id windows and the groupBy both
  * key on user_id, and the lead-over-version window re-uses the same
  * hash partitioning, so Catalyst plans a single exchange for all four
  * steps. Ordering is (ts, event_id) — the id tiebreak makes runs
  * deterministic under equal timestamps, which the DuckDB oracle mirrors.
  */
object Scd2 {

  def intervals(events: DataFrame): DataFrame = {
    val ord = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val prev = lag(col("event_type"), 1).over(ord)
    val runs = events.select("user_id", "ts", "event_id", "event_type")
      .withColumn("__chg",
        when(prev.isNull || prev =!= col("event_type"), 1L).otherwise(0L))
      .withColumn("version", sum(col("__chg")).over(
        ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "version")
      .agg(
        // event_type is constant within a run by construction; min() is
        // just the aggregate-shaped way to carry it through the groupBy.
        min(col("event_type")).as("state"),
        min(col("ts")).as("__from"),
        count(lit(1)).as("n_events"))
    val byVer = Window.partitionBy("user_id").orderBy("version")
    runs
      .withColumn("valid_from_ms", graft.functions.Canonical.epochMs(col("__from")))
      .withColumn("valid_to_ms",
        graft.functions.Canonical.epochMs(lead(col("__from"), 1).over(byVer)))
      .withColumn("is_current", col("valid_to_ms").isNull)
      .select("user_id", "version", "state", "valid_from_ms", "valid_to_ms",
        "n_events", "is_current")
  }
}
