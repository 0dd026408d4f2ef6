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

  /** Robust per-group outlier detection by Median Absolute Deviation —
    * the distribution-free QA pass a curation pipeline runs on every
    * numeric signal (doc length, token count, event value): flag rows
    * whose deviation from the group median exceeds `k`× the group MAD.
    * Mean/stddev z-scores break down exactly when needed most (the
    * outliers drag the mean); the median/MAD pair is 50%-breakdown
    * robust.
    *
    * INTEGER-EXACT end to end: values cast to long, medians are DISCRETE
    * lower-medians selected by rank arithmetic ((n+1) div 2, ties broken
    * by `idCol`), deviations are integer |v − med|, and the flag is an
    * integer comparison — no float anywhere, so the oracle matches bit
    * for bit. A group with MAD = 0 (over half its values identical)
    * flags every row that deviates at all — deterministic, and the
    * honest reading of "k× nothing".
    *
    * Scale posture: two ranking windows partitioned BY GROUP (never
    * corpus-global) on one shuffle key; the per-group median/MAD
    * relations are group-count-sized and broadcast back. No collect.
    */
  def madOutliers(df: DataFrame, groupCol: String, idCol: String,
                  valueCol: String, k: Int = 3): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val base = df.select(col(groupCol).as("g"),
      col(idCol).cast("long").as("id"), col(valueCol).cast("long").as("v"))
    val wv = Window.partitionBy("g").orderBy(col("v").asc, col("id").asc)
    val ranked = base.withColumn("__rn", row_number().over(wv))
      .withColumn("__cnt", count(lit(1)).over(Window.partitionBy("g")))
    val med = ranked.filter(col("__rn") === expr("(__cnt + 1) div 2"))
      .select(col("g"), col("v").as("med"))
    val dev = base.join(broadcast(med), "g")
      .withColumn("dev", abs(col("v") - col("med")))
    val wd = Window.partitionBy("g").orderBy(col("dev").asc, col("id").asc)
    val mad = dev.withColumn("__rn", row_number().over(wd))
      .withColumn("__cnt", count(lit(1)).over(Window.partitionBy("g")))
      .filter(col("__rn") === expr("(__cnt + 1) div 2"))
      .select(col("g"), col("dev").as("mad"))
    dev.join(broadcast(mad), "g")
      .filter(col("dev") > lit(k.toLong) * col("mad"))
      .select(col("g").as(groupCol), col("id").as(idCol),
        col("v").as(valueCol), col("med"), col("mad"), col("dev"))
      .orderBy(groupCol, idCol)
  }
}
