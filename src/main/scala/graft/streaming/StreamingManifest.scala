package graft.streaming

import graft.functions.TextKernels
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming twin of [[graft.operators.BloomManifest]] maintenance: a
  * live key-ingest stream folds into the standing per-shard Bloom
  * manifest via mapGroupsWithState on (shard, word), emitting each
  * word's updated bitmap per micro-batch — the continuously maintained
  * version of the batch `merge` face (`shard_bloom_merge`), where batch
  * ingest folds a delta manifest in per batch.
  *
  * bit_or is commutative, associative, and idempotent, so the fold is
  * ORDER-FREE and REPLAY-SAFE: keys arriving late, twice, or across
  * arbitrary micro-batch boundaries produce the identical final state —
  * replay == batch manifest bit-for-bit (spec-asserted). State is one
  * long per touched (shard, word) — exactly the manifest's own sparse
  * cardinality, the minimum any maintainer must hold.
  *
  * Geometry (words, k=3 salted md5 positions, 60-bit layout) mirrors
  * BloomManifest.positions exactly — same salts "bm0:"/"bm1:"/"bm2:",
  * same 48-bit hash — so a streamed manifest and a batch-built one are
  * interchangeable tables.
  */
object StreamingManifest {

  /** One ingested key for a shard. */
  case class KeyIngest(shard: String, key: Long)

  /** A (shard, word) bitmap after folding the batch. */
  case class WordBits(shard: String, word: Long, bits: Long,
                      set_bits: Long)

  /** The k=3 salted positions of a key in the words*60-bit space —
    * value-identical to BloomManifest.positions (md5 first 12 hex chars
    * as a 48-bit big-endian long == TextKernels.h48 of the same bytes).
    */
  def positions(key: Long, words: Int): Seq[Long] = (0 until 3).map { i =>
    val h = TextKernels.h48(s"bm$i:$key".getBytes("UTF-8"))
    ((h % (words * 60L)) + words * 60L) % (words * 60L)
  }

  /** The streaming operator: key ingest → per-(shard, word) bitmap
    * updates (Update-mode emission: each touched word re-emits its
    * current bits every micro-batch).
    */
  def maintain(ingest: Dataset[KeyIngest],
               words: Int = 17): Dataset[WordBits] = {
    import ingest.sparkSession.implicits._
    ingest
      .flatMap { k =>
        positions(k.key, words).map { pos =>
          (k.shard, pos / 60L, 1L << (pos % 60L).toInt)
        }
      }
      .groupByKey { case (shard, word, _) => (shard, word) }
      .mapGroupsWithState[Long, WordBits](GroupStateTimeout.NoTimeout()) {
        (wk: (String, Long), rows: Iterator[(String, Long, Long)],
         state: GroupState[Long]) =>
          val bits = rows.foldLeft(state.getOption.getOrElse(0L)) {
            case (acc, (_, _, mask)) => acc | mask
          }
          state.update(bits)
          WordBits(wk._1, wk._2, bits,
            java.lang.Long.bitCount(bits).toLong)
      }
  }
}
