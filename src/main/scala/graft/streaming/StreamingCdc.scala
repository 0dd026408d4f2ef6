package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming face of the batch CDC collapse (`orders_cdc_merge`,
  * EventQueries): a live changelog of versioned upserts/deletes folds
  * into a per-key CURRENT ROW via mapGroupsWithState — the continuously
  * maintained MERGE target, where the batch query recomputes the
  * collapse from the full log.
  *
  * Latest-wins is a pure max-by-version fold, so it is ORDER-FREE: a
  * change arriving late (older version after newer) cannot regress the
  * state — the exact property a distributed changelog needs, since
  * per-key order across partitions/batches is not guaranteed. Versions
  * are assumed unique per key (any CDC source with a commit ts/LSN
  * provides this); ties would have no defined winner in any engine.
  *
  * State is one row per live key (the MERGE target's own cardinality —
  * the minimum any upsert materialization holds); no timeout, keys live
  * until deleted. A delete keeps the tombstone IN STATE (op = "D")
  * rather than removing it: dropping the entry would let a late
  * pre-delete version resurrect the key. Emission is per-batch Update
  * mode: each key touched in a micro-batch emits its new current row
  * exactly once (tombstones included, so the sink can propagate the
  * delete downstream).
  */
object StreamingCdc {

  /** One changelog record: op ∈ {I, U, D}, version unique per key. */
  case class Change(k: Long, version: Long, op: String, status: String,
                    cents: Long)

  /** The key's current row after folding the batch. */
  case class Current(k: Long, version: Long, op: String, status: String,
                     cents: Long)

  def latestWins(changes: Dataset[Change]): Dataset[Current] = {
    import changes.sparkSession.implicits._
    changes.groupByKey(_.k)
      .mapGroupsWithState[Current, Current](
        GroupStateTimeout.NoTimeout()) {
        (k: Long, rows: Iterator[Change], state: GroupState[Current]) =>
          val incoming = rows.maxBy(_.version)
          val cur = state.getOption match {
            case Some(c) if c.version >= incoming.version => c
            case _ => Current(k, incoming.version, incoming.op,
              incoming.status, incoming.cents)
          }
          state.update(cur)
          cur
      }
  }
}
