package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact per-group discrete quantiles — the distribution summary a corpus
  * report leads with (token-length P50/P90 per language, chunk-size
  * spread per table). DISCRETE on purpose: the quantile is a value that
  * occurs in the data, selected by integer rank arithmetic
  * (rank = ceil(p·n) via (p_num·n + p_den - 1) div p_den), so the result
  * is engine-exact — interpolated quantiles mix floats and every engine
  * interpolates slightly differently.
  *
  * Scale posture: ONE shuffle on the group key serves the ranking windows
  * and the final aggregate (group-key partitioning satisfies the
  * grouping). No global sort; each group sorts within its partition. At
  * 100 TB with million-row groups this is the exact path; the sketch path
  * (approx_percentile) trades the oracle guarantee for O(1) memory and is
  * a drop-in swap.
  */
object Quantiles {

  /** Per-group count/min/max plus discrete P50 and P90 of `valueCol`.
    * `tieCol` must make (valueCol, tieCol) a total order within a group.
    */
  def groupStats(df: DataFrame, groupCol: String, valueCol: String,
                 tieCol: String): DataFrame = {
    val w = Window.partitionBy(groupCol)
      .orderBy(col(valueCol).asc, col(tieCol).asc)
    val ranked = df
      .withColumn("__rn", row_number().over(w))
      .withColumn("__cnt", count(lit(1)).over(Window.partitionBy(groupCol)))
    ranked.groupBy(groupCol)
      .agg(
        count(lit(1)).as("cnt"),
        min(col(valueCol)).as("min_v"),
        max(col(valueCol)).as("max_v"),
        max(when(col("__rn") === expr("(__cnt + 1) div 2"), col(valueCol)))
          .as("p50"),
        max(when(col("__rn") === expr("(9 * __cnt + 9) div 10"), col(valueCol)))
          .as("p90"))
  }
}
