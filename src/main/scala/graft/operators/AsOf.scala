package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, the right row with the
  * greatest timestamp <= the left row's timestamp sharing the join key —
  * the lookup every event pipeline needs for "the state in effect when
  * this happened" (latest config, last purchase, prevailing price).
  *
  * Spark has no native as-of operator, and the naive encoding — a range
  * join `l.key = r.key AND r.ts <= l.ts` + a per-left max — explodes into
  * every (left, earlier-right) pairing before pruning (quadratic per key,
  * and a non-equi conjunct that falls off the hash-join path). This is
  * the standard union trick instead: tag both sides, sort each key's
  * timeline once, and carry the last seen right payload forward with a
  * running `last(ignoreNulls)` window. ONE shuffle on the key, one
  * in-partition sort, zero candidate blowup — the plan a 100 TB timeline
  * wants. Ties (left ts == right ts) are INCLUSIVE, matching DuckDB's
  * `ASOF JOIN ... ON l.ts >= r.ts` oracle semantics: right rows sort
  * before left rows at the same timestamp.
  *
  * The right side must be unique per (key, ts) — equal-timestamp right
  * duplicates have no defined winner in any as-of semantics; dedupe
  * upstream (e.g. keep the max event id per instant).
  */
object AsOf {

  /** @param payload right columns to attach, emitted as `asof_<name>`;
    *   left rows with no as-of match carry NULLs there. The payload
    *   rides the timeline as ONE struct column filled by a single
    *   `last(ignoreNulls)` window, so all `asof_*` values always come
    *   from the same right row — per-column fills would stitch values
    *   from different rows whenever a payload column is legitimately
    *   NULL while a sibling is not (a torn payload).
    */
  def asOf(left: DataFrame, right: DataFrame, key: String, ts: String,
           payload: Seq[String]): DataFrame = {
    val payType = org.apache.spark.sql.types.StructType(payload.map(c =>
      org.apache.spark.sql.types.StructField(
        c, right.schema(c).dataType, nullable = true)))
    // both union legs get the full output schema; the missing side's
    // columns ride as typed NULLs
    val l = left.withColumn("__side", lit(1))
      .withColumn("__asof_pay", lit(null).cast(payType))
    val leftOnly = left.columns.toSeq.filterNot(Set(key, ts))
    val r = leftOnly.foldLeft(
      right.select(col(key), col(ts),
        struct(payload.map(col): _*).as("__asof_pay"))
        .withColumn("__side", lit(0))) { (df, c) =>
      df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }
    val w = Window.partitionBy(key)
      .orderBy(col(ts).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = l.unionByName(r.select(l.columns.map(col): _*))
      .withColumn("__asof_pay",
        last(col("__asof_pay"), ignoreNulls = true).over(w))
    val unpacked = payload.foldLeft(filled.filter(col("__side") === 1)) {
      (df, c) => df.withColumn(s"asof_$c", col("__asof_pay").getField(c))
    }
    unpacked.drop("__side", "__asof_pay")
  }

  /** [[asOf]] with a STALENESS BOUND: a match only counts when the right
    * row is at most `toleranceMs` older than the left row; beyond that
    * the payload is NULL, exactly as if no right row existed. This is
    * the semantics real point-in-time lookups want at 100 TB ("the
    * prevailing price — unless the quote is more than an hour stale, in
    * which case there IS no prevailing price") and what keeps LOCF from
    * smearing a years-old value across a silent key.
    *
    * Same single-shuffle union plan as [[asOf]]: the right timestamp
    * rides the payload struct (so staleness is judged against the SAME
    * row the payload came from — never a torn pair), and the bound is a
    * post-window projection, not a join condition, so nothing falls off
    * the hash path.
    */
  def asOfWithin(left: DataFrame, right: DataFrame, key: String,
                 ts: String, payload: Seq[String],
                 toleranceMs: Long): DataFrame = {
    require(toleranceMs >= 0, "tolerance must be non-negative")
    val r = right.withColumn("__rt_ms",
      graft.functions.Canonical.epochMs(col(ts)))
    val joined = asOf(left, r, key, ts, payload :+ "__rt_ms")
    val gap = graft.functions.Canonical.epochMs(col(ts)) -
      col("asof___rt_ms")
    // gap NULL (no match at all) keeps the already-NULL payload via the
    // otherwise branch; only a PRESENT-but-stale match is nulled out.
    payload.foldLeft(joined) { (df, c) =>
      df.withColumn(s"asof_$c",
        when(gap > toleranceMs,
          lit(null).cast(df.schema(s"asof_$c").dataType))
          .otherwise(col(s"asof_$c")))
    }.drop("asof___rt_ms")
  }
}
