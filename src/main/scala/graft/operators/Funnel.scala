package graft.operators

import graft.functions.Canonical
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered conversion funnel — "how many users reached step k IN ORDER"
  * (view -> click -> purchase), the standard behavioral rollup over an
  * event log. A user reaches step k at the EARLIEST event of that type
  * at-or-after their step-(k-1) time; same-instant progression counts
  * (ties are allowed, matching the at-or-before semantics of [[AsOf]]).
  *
  * Scale posture: one conditional aggregation per step, each grouped on
  * the user key — the per-step joins are user-keyed equi-joins over
  * already-aggregated (one row per user) relations, so after the first
  * shuffle the step relations are tiny and shrink monotonically down the
  * funnel. No window over the full log, no self-join of raw events.
  */
object Funnel {

  /** Per-user step times (NULL where the user never reached the step in
    * order) — the row-level funnel relation.
    */
  def reachTimes(events: DataFrame, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val e = events.select(col("user_id"), col("event_type"),
      Canonical.epochMs(col("ts")).as("__ts_ms"))
    val stepDfs = steps.zipWithIndex.foldLeft(List.empty[(String, DataFrame)]) {
      case (acc, (step, i)) =>
        val mine = e.filter(col("event_type") === step)
        val reached = acc.headOption match {
          case None =>
            mine.groupBy("user_id")
              .agg(min(col("__ts_ms")).as(s"t_$step"))
          case Some((prevCol, p)) =>
            mine.join(p.select(col("user_id"), col(prevCol)), "user_id")
              .filter(col("__ts_ms") >= col(prevCol))
              .groupBy("user_id")
              .agg(min(col("__ts_ms")).as(s"t_$step"))
        }
        val _ = i
        (s"t_$step", reached) :: acc
    }.reverse
    val base = e.select("user_id").distinct()
    stepDfs.foldLeft(base) { case (acc, (_, s)) =>
      acc.join(s, Seq("user_id"), "left")
    }
  }

  /** Per-step reach counts: ONE aggregation over [[reachTimes]] (a
    * non-null count per step column), unpivoted to (step, event_type,
    * users) rows.
    */
  def reach(events: DataFrame, steps: Seq[String]): DataFrame = {
    val rt = reachTimes(events, steps)
    val aggs = steps.map(s => count(col(s"t_$s")).as(s"c_$s"))
    val one = rt.agg(aggs.head, aggs.tail: _*)
    val rows = steps.zipWithIndex.map { case (s, i) =>
      struct(lit(i + 1).as("step"), lit(s).as("event_type"),
        col(s"c_$s").as("users"))
    }
    one.select(explode(array(rows: _*)).as("r")).select("r.*")
  }
}
