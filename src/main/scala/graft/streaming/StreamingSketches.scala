package graft.streaming

import graft.operators.Sketches
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming face of [[Sketches.hllDistinct]]: per-group HLL registers as
  * mapGroupsWithState state, re-estimated every micro-batch.
  *
  * This is the sketch's whole reason to exist in a streaming engine: the
  * state is 256 small ints per group FOREVER (a streaming exact distinct
  * needs unbounded key state), the merge is register-wise max (so late,
  * replayed, or duplicated events cannot corrupt it — max is idempotent),
  * and because registers and the estimate arithmetic are shared with the
  * batch operator ([[Sketches.registerOf]] / estimateFromRegisters), the
  * streaming estimate after any prefix of micro-batches equals the batch
  * estimate over the same rows BIT FOR BIT — the parity the spec asserts.
  */
object StreamingSketches {

  case class HllEstimate(grp: String, hll_estimate: Double, present: Int)

  def hllEstimates(events: DataFrame, keyCol: String,
                   groupCol: String): Dataset[HllEstimate] = {
    import events.sparkSession.implicits._
    events
      .select(col(groupCol).cast("string").as("grp"),
        col(keyCol).cast("string").as("k"))
      .as[(String, String)]
      .groupByKey(_._1)
      .mapGroupsWithState[Array[Int], HllEstimate](
        GroupStateTimeout.NoTimeout()) {
        (grp: String, rows: Iterator[(String, String)],
         state: org.apache.spark.sql.streaming.GroupState[Array[Int]]) =>
          val regs = state.getOption.getOrElse(new Array[Int](Sketches.M))
          // null keys are excluded, matching the batch face's filter
          rows.foreach { case (_, k) =>
            if (k != null) {
              val (bucket, rho) = Sketches.registerOf(k)
              if (rho > regs(bucket)) regs(bucket) = rho
            }
          }
          state.update(regs)
          HllEstimate(grp, Sketches.estimateFromRegisters(regs),
            regs.count(_ > 0))
      }
  }

  /** Convenience writer contract used by specs: Update-mode memory sink. */
  def outputMode: OutputMode = OutputMode.Update()

  case class CmsPoint(grp: String, probe_key: String, cms_estimate: Long)

  /** Streaming face of the count-min sketch: per-group 4×1024 counter
    * state, probed for a fixed key list every micro-batch. The honest
    * contrast with [[hllEstimates]]: CMS merge is SUM, not max —
    * incrementing is NOT idempotent, so this face leans on the engine's
    * exactly-once state guarantee rather than algebraic immunity to
    * replay. What it keeps is bounded state (4096 longs per group,
    * forever, over any key cardinality) and counters shared cell-for-cell
    * with the batch face via [[Sketches.cmsCellsOf]], so the estimate
    * after any prefix of micro-batches equals the batch fold over the
    * same rows exactly — the parity the spec asserts.
    */
  def cmsPointEstimates(events: DataFrame, keyCol: String, groupCol: String,
                        probes: Seq[String]): Dataset[CmsPoint] = {
    import events.sparkSession.implicits._
    val w = Sketches.CmsW.toInt
    events
      .select(col(groupCol).cast("string").as("grp"),
        col(keyCol).cast("string").as("k"))
      .as[(String, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Array[Long], CmsPoint](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (grp: String, rows: Iterator[(String, String)],
         state: org.apache.spark.sql.streaming.GroupState[Array[Long]]) =>
          val cells = state.getOption
            .getOrElse(new Array[Long](Sketches.CmsD * w))
          rows.foreach { case (_, k) =>
            if (k != null) {
              val bs = Sketches.cmsCellsOf(k)
              var d = 0
              while (d < bs.length) { cells(d * w + bs(d)) += 1L; d += 1 }
            }
          }
          state.update(cells)
          probes.iterator.map { p =>
            val bs = Sketches.cmsCellsOf(p)
            var est = Long.MaxValue
            var d = 0
            while (d < bs.length) {
              est = math.min(est, cells(d * w + bs(d))); d += 1
            }
            CmsPoint(grp, p, est)
          }
      }
  }
}
