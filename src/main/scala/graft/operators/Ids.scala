package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Order-preserving dense row numbering WITHOUT a global window — the
  * surrogate-key assignment a 100 TB ingest needs: `row_number() OVER
  * (ORDER BY key)` moves the entire relation through ONE partition (the
  * WindowExec warning Spark prints is the cluster falling over), and
  * `monotonically_increasing_id` is neither dense nor order-preserving.
  *
  * Two-phase instead: range-bucket by `key div bucketWidth` (order-
  * preserving by construction), rank WITHIN each bucket, and add the
  * bucket's prefix offset. The only window that crosses buckets runs
  * over the BUCKET-SUMMARY relation — max(key)/bucketWidth rows, a
  * bounded planning artifact, not the data. Result is bit-identical to
  * the global row_number (the oracle proves it) at per-bucket
  * parallelism.
  */
object Ids {

  /** (original columns of `keyCol`) → (keyCol, dense_id) with dense_id =
    * 0-based global rank of `keyCol` (which must be unique non-null). */
  def denseIds(df: DataFrame, keyCol: String,
               bucketWidth: Long = 1000L): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val keyed = df.select(col(keyCol).cast("long").as("k"))
      .filter(col("k").isNotNull)
      .withColumn("bucket", expr(s"k div ${bucketWidth}L"))
    val local = keyed.withColumn("local_rank",
      row_number().over(Window.partitionBy("bucket").orderBy("k")))
    // bucket-summary relation: one row per occupied bucket — the prefix
    // sum runs over THIS, never the data (Window.orderBy here is a
    // single-partition window over a bounded summary, by design)
    val offsets = keyed.groupBy("bucket").agg(count(lit(1)).as("n"))
      .withColumn("offset",
        coalesce(sum("n").over(Window.orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("bucket", "offset")
    local.join(broadcast(offsets), "bucket")
      .select(col("k").as(keyCol),
        (col("offset") + col("local_rank") - 1).as("dense_id"))
  }
}
