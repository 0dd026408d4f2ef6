package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout — multi-dimensional file clustering
  * for scan pruning. Partitioning prunes on ONE column
  * (`events_partition_prune`); sorting clusters on a prefix. Interleaving
  * the bits of two keys orders rows along a space-filling curve, so
  * consecutive file-sized runs are tight bounding boxes in BOTH
  * dimensions at once — parquet min/max footer stats then skip files for
  * predicates on either key (the layout trick behind Delta/Iceberg
  * Z-ordering; the reference's chunk table `step3_run_syncdiff.sh:114`
  * is the 1-D special case).
  *
  * Everything here is integer bit arithmetic — bit-exact across engines,
  * so the layout decision itself is oracle-checkable, not just the read
  * path.
  */
object ZOrder {

  /** 2x16-bit Morton interleave: bit i of `x` lands at position 2i, bit i
    * of `y` at 2i+1. Inputs are masked to 16 bits first (callers map
    * wider domains onto the grid — for pruning, relative order within
    * the data's range is what matters).
    */
  def zValue(x: Column, y: Column, bits: Int = 16): Column = {
    val xm = x.bitwiseAND(lit((1L << bits) - 1))
    val ym = y.bitwiseAND(lit((1L << bits) - 1))
    (0 until bits).map { i =>
      shiftleft(shiftright(xm, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(ym, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** Assign `df` rows to `nFiles` equal-depth files along the Z-curve of
    * (`xCol`, `yCol`) and emit each file's bounding box over both
    * dimensions — the min/max footer stats a scan would prune on. Tie
    * order inside equal z-values is `tieCol` (total, deterministic).
    *
    * The single-partition ntile window ranks file ASSIGNMENT only; at
    * 100 TB the same split comes from `df.repartitionByRange` on the
    * z-value (range exchange, no global window) — the bounding-box
    * CONTRACT this operator checks is identical.
    */
  def layout(df: DataFrame, xCol: String, yCol: String, tieCol: String,
             nFiles: Int = 16): DataFrame =
    df.withColumn("__z", zValue(col(xCol), col(yCol)))
      .withColumn("file_id",
        ntile(nFiles).over(Window.orderBy(col("__z"), col(tieCol))).cast("int"))
      .groupBy("file_id")
      .agg(
        count(lit(1)).as("n_rows"),
        min(col("__z")).as("z_min"), max(col("__z")).as("z_max"),
        min(col(xCol)).as("x_min"), max(col(xCol)).as("x_max"),
        min(col(yCol)).as("y_min"), max(col(yCol)).as("y_max"))
}
