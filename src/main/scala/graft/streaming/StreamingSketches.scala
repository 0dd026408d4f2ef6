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
}
