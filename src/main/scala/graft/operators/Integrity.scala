package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Referential-integrity audit — the cross-table face of the reference's
  * consistency checking (its per-table diff answers "do the two copies of
  * one table agree"; this answers "do the tables agree with each other"
  * — orphaned children, dangling foreign keys — the audit a migration or
  * ingest pipeline runs over the same snapshots).
  *
  * One pass per check: a LEFT join against the parent's distinct keys and
  * a conditional count — total and orphan counts come from the same scan,
  * no second action. The distinct parent-key relation is as narrow as the
  * key itself, so dimension-sized parents broadcast and fact-sized ones
  * shuffle only their key column.
  */
object Integrity {

  /** One audit row: child rows, orphans (child keys with no parent), and
    * the verdict. `keys` maps child column -> parent column.
    */
  def check(name: String, child: DataFrame, parent: DataFrame,
            keys: Seq[(String, String)]): DataFrame = {
    val parentKeys = parent
      .select(keys.map { case (c, p) => col(p).as(s"__pk_$c") }: _*)
      .distinct()
      .withColumn("__hit", lit(1))
    val cond = keys.map { case (c, _) => col(c) === col(s"__pk_$c") }
      .reduce(_ && _)
    child.join(parentKeys, cond, "left")
      .agg(
        count(lit(1)).as("child_rows"),
        count(when(col("__hit").isNull, 1)).as("orphan_rows"))
      .select(
        lit(name).as("check_name"),
        col("child_rows"),
        col("orphan_rows"),
        (col("orphan_rows") === 0).as("ok"))
  }

  /** Union several checks into one audit relation. */
  def audit(checks: Seq[DataFrame]): DataFrame =
    checks.reduce(_ unionByName _)
}
