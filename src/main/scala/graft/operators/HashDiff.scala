package graft.operators

import graft.functions.Canonical
import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Keyless (multiset) table diff.
  *
  * The reference's engine requires an index to key the comparison
  * (`sync_diff_inspector` chunks by PK/index ranges —
  * `my_database_users.toml:45`); tables without a unique key cannot be
  * compared row-by-row. This operator adds the standard fallback: compare
  * the two sides as multisets of canonical row fingerprints. Classes
  * reduce to missing/extra (a "mutation" appears as one missing + one
  * extra fingerprint); no fix-SQL keying is possible, matching the
  * reference's index requirement rationale.
  *
  * Scale posture: one groupBy(fingerprint) shuffle per side with map-side
  * partial counts, then an equi-join on the fingerprint — both shuffles
  * hash-partition on the same key, so AQE coalesces and no re-shuffle
  * happens for the join. Output is bounded by the drift size.
  *
  * Multiset membership is decided on the FULL 128-bit md5 fingerprint
  * (collision discipline, [[graft.functions.Canonical]]) — this keyless
  * path has no row drill-down to catch a truncated-hash collision, so the
  * full lane is mandatory here.
  */
object HashDiff {

  private def counted(df: DataFrame, cnt: String, vals: Option[String]): DataFrame = {
    val cols = df.schema.fields.toSeq.map(f => (col(f.name), f.dataType))
    val keyed = df.select(
      Canonical.fingerprint(cols).as("row_fp") +:
        vals.map(_ => Canonical.serialCsv(cols).as("vals")).toSeq: _*)
    vals match {
      case Some(v) => keyed.groupBy("row_fp")
        .agg(count(lit(1)).as(cnt), min(col("vals")).as(v))
      case None => keyed.groupBy("row_fp").agg(count(lit(1)).as(cnt))
    }
  }

  /** @param withVals carry a sample serialized payload per fingerprint —
    *   needed by the drill-down diff, pure overhead (a second full
    *   serialization + wide shuffle) for the count-only summary
    */
  private def joined(up: DataFrame, down: DataFrame, withVals: Boolean): DataFrame =
    counted(up, "up_cnt", if (withVals) Some("up_vals") else None)
      .join(counted(down, "down_cnt", if (withVals) Some("down_vals") else None),
        Seq("row_fp"), "full_outer")
      .withColumn("up_cnt", coalesce(col("up_cnt"), lit(0L)))
      .withColumn("down_cnt", coalesce(col("down_cnt"), lit(0L)))

  /** Multiset diff of two homologous tables: rows whose fingerprint
    * multiplicity differs. Output: row_fp, up_cnt, down_cnt (0 when
    * absent), sample serial payload from whichever side has the row.
    */
  def diff(up: DataFrame, down: DataFrame): DataFrame =
    joined(up, down, withVals = true)
      .filter(col("up_cnt") =!= col("down_cnt"))
      .withColumn("diff_kind",
        when(col("up_cnt") > col("down_cnt"), lit("missing_on_down"))
          .otherwise(lit("extra_on_down")))
      .withColumn("vals", coalesce(col("up_vals"), col("down_vals")))
      .select("row_fp", "diff_kind", "up_cnt", "down_cnt", "vals")

  /** One-pass summary (both row counts + differing-fingerprint tally) for
    * the report stage — avoids re-running the diff per verdict/count.
    */
  def summary(up: DataFrame, down: DataFrame): DataFrame =
    joined(up, down, withVals = false).agg(
      sum(col("up_cnt")).as("upcount"),
      sum(col("down_cnt")).as("downcount"),
      sum(when(col("up_cnt") =!= col("down_cnt"), 1L).otherwise(0L))
        .as("bad_fingerprints"))
}
