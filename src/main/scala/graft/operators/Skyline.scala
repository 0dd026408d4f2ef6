package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D Pareto skyline (both dimensions maximize) — the multi-objective
  * selection a curation pass runs when no single score exists ("newest
  * AND largest", "highest quality AND longest"): a row is on the skyline
  * iff NO other row is >= in both dimensions and > in at least one.
  *
  * The naive formulation is an O(n²) NOT-EXISTS self-join. This operator
  * uses the suffix-max decomposition instead: with integer dimensions
  * (x, y), a row p is dominated exactly when
  *   - some row with x' > p.x has y' >= p.y   (strictly better x, no
  *     worse y), i.e. suffixMax(p.x) >= p.y, where suffixMax(v) is the
  *     max y over all x' > v; or
  *   - some row with the SAME x has y' > p.y, i.e. p.y < groupMax(p.x).
  * So the skyline is: y == groupMax(x) AND y > suffixMax(x).
  *
  * Scale posture: one groupBy(x) collapses the data to the per-x summary
  * (bounded by distinct x, not rows); the suffix max is a window over
  * THAT summary; the verdict joins back on x. No self-join, no O(n²)
  * anywhere — the same bounded-summary-window device as the dense-id
  * offsets and the drift CDF.
  */
object Skyline {

  /** Skyline rows of `df` maximizing (xCol, yCol) — both cast to long;
    * ties on both dimensions are all kept (none strictly dominates). */
  def pareto2D(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val base = df.withColumn("__x", col(xCol).cast("long"))
      .withColumn("__y", col(yCol).cast("long"))
      .filter(col("__x").isNotNull && col("__y").isNotNull)
    val perX = base.groupBy("__x").agg(max("__y").as("__gmax"))
    val w = Window.orderBy(col("__x").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    // suffix max over the per-x summary (bounded), -infinity for the max x
    val summary = perX.withColumn("__smax",
      coalesce(max("__gmax").over(w), lit(Long.MinValue)))
    base.join(broadcast(summary), "__x")
      .filter(col("__y") === col("__gmax") && col("__y") > col("__smax"))
      .drop("__x", "__y", "__gmax", "__smax")
  }
}
