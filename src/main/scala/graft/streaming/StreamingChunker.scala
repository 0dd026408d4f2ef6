package graft.streaming

import graft.functions.TextKernels
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming face of content-defined chunking (`cdc_chunks`,
  * TextAnalysis.cdcChunks): documents arrive as ordered APPEND deltas —
  * the live-ingest shape (a crawler streaming page segments, a log
  * shipper streaming file appends) — and each document's chunk stream is
  * emitted incrementally via flatMapGroupsWithState, bit-identical to
  * what the batch kernel computes over the assembled document.
  *
  * Why incremental emission is sound: a cut at code-point position `p`
  * depends ONLY on the 8-gram starting at `p` (TextKernels.cdcBounds).
  * Appended text can therefore create or change cut decisions only at
  * positions whose gram overlaps the former end of text — the last 7
  * code points. Every position whose full 8-gram lies inside the known
  * text has a FINAL cut decision, chunks closed by such cuts can ship
  * immediately, and only the open tail (from the last confirmed cut)
  * stays in state. That state is bounded by the expected chunk length
  * (≈ `d` code points), not the document length — the property that
  * makes streaming CDC viable at ingest scale.
  *
  * The batch kernel never scans capped end-grams either (its n = cp-7
  * bound), so scanning only full-gram positions here reproduces the
  * batch cut set exactly; a `fin` marker (the document-complete event
  * any ingest protocol carries) flushes the open tail as the final
  * chunk — the same "last cut .. length+1" span the batch assembly
  * emits, including the zero-length chunk of an empty document.
  *
  * Scan positions start at local offset 1 in every state: offset 0 is
  * either absolute position 1 (never a cut — the batch `x > 1` filter)
  * or the cut that opened this tail (already consumed; its gram still
  * divides `d`, so rescanning it would mint spurious zero-length
  * chunks).
  *
  * Per-batch delta order: deltas sort by `seq` within a batch;
  * cross-batch order is the source's responsibility (same contract as
  * any log-ordered streaming source). Replay == batch is spec-asserted
  * (StreamingChunkerSpec) against TextAnalysis.cdcChunks.
  */
object StreamingChunker {

  /** One append delta; seq orders deltas within a doc. A record with
    * `fin = true` marks the document complete (its text is ignored).
    */
  case class Delta(doc_id: Long, seq: Long, text: String, fin: Boolean)

  /** Emitted chunk — identical shape to the batch `cdc_chunks` face. */
  case class Chunk(doc_id: Long, chunk_idx: Long, start: Long,
                   chunk_len: Long, chunk_md5: String)

  /** Open-tail state: chunks emitted so far, the 1-based absolute
    * code-point position where the open tail starts, and the tail text.
    */
  case class Tail(nEmitted: Long, absStart: Long, tail: String)

  private def md5Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    d.map(b => f"$b%02x").mkString
  }

  private def cpLen(s: String): Int = s.codePointCount(0, s.length)

  /** Code-point slice [from, from+len) of `s` (0-based `from`). */
  private def cpSlice(s: String, from: Int, len: Int): String = {
    val a = s.offsetByCodePoints(0, from)
    val b = s.offsetByCodePoints(a, len)
    s.substring(a, b)
  }

  /** Fold a doc's new deltas into its tail state, emitting every chunk
    * whose closing cut is final (plus the flushed tail on `fin`). Pure —
    * shared by the streaming face and the spec's reference replay.
    */
  def advance(docId: Long, st: Tail, deltas: Seq[Delta],
              d: Int): (Tail, Seq[Chunk]) = {
    val ordered = deltas.sortBy(_.seq)
    val finSeen = ordered.exists(_.fin)
    var tail = st.tail + ordered.filterNot(_.fin).map(_.text).mkString
    var absStart = st.absStart
    var n = st.nEmitted
    val out = scala.collection.mutable.ArrayBuffer.empty[Chunk]
    var searching = true
    while (searching) {
      val tl = cpLen(tail)
      var j = 1
      var cut = -1
      while (cut < 0 && j + 8 <= tl) {
        if (TextKernels.h48(cpSlice(tail, j, 8).getBytes("UTF-8")) % d == 0)
          cut = j
        else j += 1
      }
      if (cut < 0) searching = false
      else {
        n += 1
        out += Chunk(docId, n, absStart, cut, md5Hex(cpSlice(tail, 0, cut)))
        absStart += cut
        tail = cpSlice(tail, cut, tl - cut)
      }
    }
    if (!finSeen) (Tail(n, absStart, tail), out.toSeq)
    else {
      val tl = cpLen(tail)
      out += Chunk(docId, n + 1, absStart, tl, md5Hex(tail))
      (Tail(n + 1, absStart + tl, ""), out.toSeq)
    }
  }

  /** The streaming operator: per-doc append deltas → incremental chunk
    * stream. State per in-flight document is the bounded open tail.
    */
  def chunkStream(deltas: Dataset[Delta], d: Int = 64): Dataset[Chunk] = {
    import deltas.sparkSession.implicits._
    deltas.groupByKey(_.doc_id)
      .flatMapGroupsWithState[Tail, Chunk](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (docId: Long, rows: Iterator[Delta], state: GroupState[Tail]) =>
          val st = state.getOption.getOrElse(Tail(0L, 1L, ""))
          val (next, chunks) = advance(docId, st, rows.toSeq, d)
          state.update(next)
          chunks.iterator
      }
  }
}
