package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sliding time-range join via bucket binning — the scale-safe plan for
  * "each probe row against the build rows of the same key within the
  * trailing window" (the reference's range predicate P6 generalized from
  * a static split to a per-row trailing interval; cf.
  * `my_database_users.toml:29` `range` and `step3_run_syncdiff.sh:114`'s
  * chunked comparison, which likewise turn an unbounded comparison into
  * bounded key-local work).
  *
  * A naive formulation is a θ-join (`b.ts BETWEEN p.ts - w AND p.ts`):
  * Catalyst can only plan that as a per-key cartesian (BNLJ after a key
  * equi-join), which is quadratic in each key's row count — a hot key at
  * 100 TB stalls the stage. Binning restores an EQUI-join: build rows
  * bucket by `floor(ts/w)`, each probe row explodes to its two candidate
  * buckets (`floor((ts-w)/w)` and `floor(ts/w)` — exactly adjacent for
  * any positive w), the join runs on `(key, bucket)` through the normal
  * shuffled-hash/SMJ machinery (AQE-eligible, skew-splittable), and the
  * residual interval predicate filters inside the join row. Candidate
  * work is 2x bucket occupancy per probe instead of per-key quadratic.
  *
  * The LEFT join + conditional aggregation keeps zero-match probe rows
  * (every probe survives with n=0), which a post-join filter would drop.
  */
object RangeJoin {

  /** Per-probe-row trailing-window aggregate: for each row of `probe`,
    * the count and canonical-cents sum of `build` rows with the same
    * `key` and `buildTs` in the half-open interval
    * `(probeTs - windowMs, probeTs]`. `idCols` must identify a probe row.
    *
    * Output: idCols ++ (key, ts_ms, n_in_window, cents_in_window).
    */
  def trailingAgg(probe: DataFrame, build: DataFrame, key: String,
                  tsCol: String, valueCol: String, windowMs: Long,
                  idCols: Seq[String]): DataFrame = {
    require(windowMs > 0, s"windowMs must be positive, got $windowMs")
    val ems = graft.functions.Canonical.epochMs(col(tsCol))
    val probeExp = probe
      .withColumn("__ms", ems)
      .withColumn("__bucket", explode(array(
        expr(s"(__ms - ${windowMs}L) div ${windowMs}L"),
        expr(s"__ms div ${windowMs}L"))))
    val buildRel = build
      .select(col(key), ems.as("__bms"),
        expr(s"CAST(round($valueCol * 100) AS BIGINT)").as("__cents"))
      .withColumn("__bucket", expr(s"__bms div ${windowMs}L"))
    val hit = col("__bms").isNotNull &&
      col("__bms") > col("__ms") - windowMs && col("__bms") <= col("__ms")
    probeExp.join(buildRel, Seq(key, "__bucket"), "left")
      .groupBy((idCols.map(col) :+ col(key) :+ col("__ms").as("ts_ms")): _*)
      .agg(
        sum(when(hit, 1L).otherwise(0L)).as("n_in_window"),
        sum(when(hit, col("__cents")).otherwise(0L)).as("cents_in_window"))
  }
}
