package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** One (score, id) candidate for a bounded top-k selection. Score is an
  * exact long (cents/permille lanes — the engine's canonical money
  * shape); id is the unique tiebreaker that makes the selection a total
  * order, so results are deterministic under retries and oracle-stable.
  */
case class Scored(score: Long, id: Long)

/** Bounded-buffer per-group top-k AGGREGATE — the scale-path alternative
  * to the `row_number() OVER (PARTITION BY g ORDER BY ...)` window in
  * [[graft.operators.Rank.topKPerGroup]].
  *
  * Why an `Aggregator` and not the window (reference context: the
  * "latest run / best candidate per stratum" selections of
  * `step2_gen_toml.sh:31-34`, generalized to corpus curation):
  * a partitioned window SORTS EVERY ROW of every group after shuffling
  * the full input — at 100 TB the shuffle carries the corpus and the
  * sort spills. Registered through `functions.udaf`, this Aggregator
  * becomes a Catalyst `TypedImperativeAggregate`, which means Catalyst
  * plans a PARTIAL aggregate before the exchange: each map task reduces
  * its slice to at most k candidates per group, the shuffle carries
  * ≤ k·tasks rows per group, and the final merge is k-way list merges.
  * Memory is O(k) per group per task by construction — a hot group
  * cannot blow up a buffer the way `collect_list` + slice would.
  *
  * Determinism: the comparator is the total order (score DESC, id ASC);
  * ties beyond k are cut identically everywhere, so partial/final
  * placement cannot change the result.
  *
  * The buffer is kept ORDER-SORTED at all times: `reduce` is a single
  * insertion (linear in k, k is small) with early reject of rows worse
  * than the current k-th — the common case on sorted-ish data streams —
  * and `merge` is a linear two-pointer merge of two sorted buffers.
  */
class TopKHeap(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
  require(k >= 1, s"top-k needs k >= 1, got $k")

  // total order: higher score first, then smaller id
  @inline private def beats(a: Scored, b: Scored): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  def zero: Seq[Scored] = Vector.empty

  def reduce(buf: Seq[Scored], a: Scored): Seq[Scored] = {
    if (buf.size >= k && !beats(a, buf.last)) buf // early reject
    else {
      val i = buf.indexWhere(b => beats(a, b)) match {
        case -1 => buf.size
        case n  => n
      }
      val (pre, post) = buf.splitAt(i)
      (pre :+ a) ++ post.take(k - i - 1)
    }
  }

  def merge(b1: Seq[Scored], b2: Seq[Scored]): Seq[Scored] = {
    val out = Vector.newBuilder[Scored]
    var (i, j, n) = (0, 0, 0)
    while (n < k && (i < b1.size || j < b2.size)) {
      if (j >= b2.size || (i < b1.size && beats(b1(i), b2(j)))) {
        out += b1(i); i += 1
      } else {
        out += b2(j); j += 1
      }
      n += 1
    }
    out.result()
  }

  def finish(r: Seq[Scored]): Seq[Scored] = r

  def bufferEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
  def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
}
