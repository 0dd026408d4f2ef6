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

  /** Per-group percentile NORMALIZATION of a score, in integer permille:
    * pr = (rank − 1) · 1000 div (n − 1) (0 for a 1-row group). The
    * cross-source calibration step a mixed corpus needs before any global
    * threshold: raw quality scores aren't comparable across languages or
    * domains (different length/stopword baselines), but "top 10% of ITS
    * OWN group" is — normalize, then one `pr_permille >= 900` filter
    * selects the per-group top decile everywhere at once.
    *
    * Integer-exact (rank arithmetic only, ties broken by `tieCol`), so
    * the oracle matches bit for bit — the same reason percent_rank (a
    * float division) is NOT used.
    *
    * Scale posture: one ranking window per group partition; nothing
    * corpus-global, no collect.
    */
  def percentileNorm(df: DataFrame, groupCol: String, scoreCol: String,
                     tieCol: String): DataFrame = {
    val w = Window.partitionBy(groupCol)
      .orderBy(col(scoreCol).asc, col(tieCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .withColumn("__cnt", count(lit(1)).over(Window.partitionBy(groupCol)))
      .withColumn("pr_permille",
        when(col("__cnt") === 1, lit(0L))
          .otherwise(expr("(__rn - 1) * 1000L div (__cnt - 1)")))
      .drop("__rn", "__cnt")
  }
}
