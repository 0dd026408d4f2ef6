package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Relational repair — the in-engine application of what the fix-SQL
  * artifact (S10) expresses as REPLACE/DELETE statements: after
  * `repair(down, up, rowDiff)`, the downstream equals the upstream
  * (`diff(up, repaired)` is empty — the round-trip property the
  * reference's `export-fix-sql` exists for, SURVEY.md §5.2).
  *
  *   DELETE  -> anti-join downstream against extra-on-down PKs
  *   REPLACE -> anti-join away mismatched PKs, then union the upstream
  *              originals for missing/mismatched PKs
  *
  * All joins key on the (small, drift-bounded) diff relation — broadcast
  * against a 100 TB downstream.
  */
object Repair {

  def repair(down: DataFrame, up: DataFrame, rowDiff: DataFrame,
             pkCols: Seq[String]): DataFrame = {
    val pk = pkCols.map(col)
    val toRemove = rowDiff
      .filter(col("diff_kind").isin("extra_on_down", "value_mismatch"))
      .select(pk: _*)
    val toCopy = rowDiff
      .filter(col("diff_kind").isin("missing_on_down", "value_mismatch"))
      .select(pk: _*)
    down.join(broadcast(toRemove), pkCols, "left_anti")
      .unionByName(up.join(broadcast(toCopy), pkCols, "left_semi"))
  }
}
