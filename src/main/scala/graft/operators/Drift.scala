package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Distribution-level drift between two sides of a compare — the check
  * the reference's ROW diff cannot express: a systematic shift (every
  * value bumped 1%, a silent unit change, a skewed sampler) can leave
  * row counts equal while the VALUE DISTRIBUTION moves. Two classic
  * two-sample statistics over equi-width cent bins:
  *
  *  - Kolmogorov–Smirnov: max CDF gap, as an exact integer permille —
  *    |cum_a·N_b − cum_b·N_a| · 1000 div (N_a·N_b) per bin boundary,
  *    maxed. Common-denominator arithmetic, no float CDFs.
  *  - Pearson χ² (upstream as expected): Σ (o_d·N_u − o_u·N_d)² ·1e6
  *    div (o_u·N_d·N_u) over bins the upstream populates, micro-scaled.
  *    Cross-products run in DECIMAL(38,0) (the pmi precedent: int64
  *    wraps silently past ~1e12-row sides with ANSI off, and the wrap
  *    would diverge from an erroring oracle at exactly the advertised
  *    scale).
  *
  * Scale posture: each side aggregates once to (bin, count) — bin
  * cardinality is value-range/width, a BOUNDED summary, so the CDF
  * window and the final 1-row aggregate run over bins, never rows. The
  * totals attach via the data-derived pmod key (hash join, not BNLJ).
  */
object Drift {

  private def binned(df: DataFrame, widthCents: Long, as: String): DataFrame =
    df.select(round(col("value") * 100).cast(LongType).as("cents"))
      .withColumn("bin", expr(s"cents div ${widthCents}L"))
      .groupBy("bin").agg(count(lit(1)).as(as))

  /** One row: side totals, populated bin count, KS permille, χ² micro. */
  def twoSampleDrift(up: DataFrame, down: DataFrame,
                     widthCents: Long = 5000L): DataFrame = {
    require(widthCents > 0, "widthCents must be positive")
    val j = binned(up, widthCents, "n_up")
      .join(binned(down, widthCents, "n_down"), Seq("bin"), "full")
      .na.fill(0L, Seq("n_up", "n_down"))
    val w = Window.orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the window runs over the BIN SUMMARY (bounded by construction) —
    // single partition is fine here, same as the dense-id offset spine
    val cum = j
      .withColumn("cum_up", sum("n_up").over(w))
      .withColumn("cum_down", sum("n_down").over(w))
    val tot = j.agg(sum("n_up").as("t_up"), sum("n_down").as("t_down"))
      .withColumn("__one", pmod(col("t_up"), lit(1L)))
    cum
      .withColumn("__one", pmod(col("cum_up") + col("cum_down"), lit(1L)))
      .join(broadcast(tot), "__one")
      .withColumn("ks_contrib", expr(
        """CAST((abs(CAST(cum_up AS DECIMAL(38,0)) * t_down -
          |          CAST(cum_down AS DECIMAL(38,0)) * t_up) * 1000)
          |     div (CAST(t_up AS DECIMAL(38,0)) * t_down) AS BIGINT)"""
          .stripMargin))
      .withColumn("chi2_contrib", expr(
        """CASE WHEN n_up > 0 THEN
          |  CAST(((CAST(n_down AS DECIMAL(38,0)) * t_up -
          |         CAST(n_up AS DECIMAL(38,0)) * t_down) *
          |        (CAST(n_down AS DECIMAL(38,0)) * t_up -
          |         CAST(n_up AS DECIMAL(38,0)) * t_down) * 1000000)
          |     div (CAST(n_up AS DECIMAL(38,0)) * t_down * t_up) AS BIGINT)
          |ELSE CAST(0 AS BIGINT) END""".stripMargin))
      .groupBy("t_up", "t_down")
      .agg(count(lit(1)).as("n_bins"),
        max("ks_contrib").as("ks_permille"),
        sum("chi2_contrib").as("chi2_micro"))
      .select(col("t_up").as("n_up"), col("t_down").as("n_down"),
        col("n_bins"), col("ks_permille"), col("chi2_micro"))
  }
}
