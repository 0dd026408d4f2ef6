package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-group ranking/selection operators (W1-W3 generalized): the
  * "best k representatives per stratum" selection every corpus curation
  * pass ends with (top documents per language by quality, top candidates
  * per query by score, latest run per table).
  *
  * Scale posture: row_number over a partitioned window is one shuffle on
  * the group key and an in-partition sort; no global sort, no collect.
  * Callers MUST pass a total order (include a unique tiebreak column) or
  * the selection is nondeterministic under retries — every oracle-checked
  * use here does.
  */
object Rank {

  /** Rows ranked 1..k within each group by `order`, with the rank
    * attached as `rank`.
    */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String],
                   order: Seq[Column], k: Int): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(order: _*)
    df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
