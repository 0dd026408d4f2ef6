package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Repair-SQL generation (SURVEY.md S10).
  *
  * The reference's `export-fix-sql = true`
  * (`/root/reference/syncdiff_config2/my_database_users.toml:8`) makes the
  * diff engine emit REPLACE INTO for rows missing/mismatched on the target
  * and DELETE for rows extra on the target. This operator derives the same
  * statements from the [[TableDiff.rowDiff]] relation as a distributed
  * column transform (no driver-side loop) — written with `ds.write.text`
  * they become the fix-on-target artifact.
  */
object FixSql {

  /** @param rowDiff output of [[TableDiff.rowDiff]]
    * @param table   target table name for the statements
    * @param pkCols  primary-key column names (must exist in rowDiff)
    */
  def fromRowDiff(rowDiff: DataFrame, table: String, pkCols: Seq[String]): DataFrame = {
    val pkPred: Column = pkCols
      .map(c => concat(lit(s"$c = "), col(c).cast("string")))
      .reduce((a, b) => concat(a, lit(" AND "), b))
    rowDiff.select(
      pkCols.map(col) :+
        when(col("diff_kind") === "extra_on_down",
          concat(lit(s"DELETE FROM $table WHERE "), pkPred, lit(";")))
          .otherwise(
            concat(lit(s"REPLACE INTO $table VALUES ("), col("up_vals"), lit(");")))
          .as("fix_sql"): _*)
  }
}
