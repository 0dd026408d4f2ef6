package graft.sources

import java.util.concurrent.atomic.AtomicInteger

import graft.Scratch
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed-table sink + co-located join — the shuffle-elimination play
  * for joins that repeat on the same key at 100 TB.
  *
  * The reference re-scans and re-pairs both sides on every comparison run
  * (`step3_run_syncdiff.sh` re-reads master and slave in full each
  * invocation); on Spark the idiomatic fix is to persist both sides
  * bucketed + sorted on the join key once, so every later join/aggregate
  * on that key runs with ZERO exchanges — the scan itself reports the
  * hash distribution and sort order, and Catalyst drops both the shuffle
  * and the sort from the plan. At 1000 executors this turns the nightly
  * re-compare from a full-corpus shuffle into a map-side merge.
  *
  * Bucket counts must match on both sides (Spark joins bucketed tables
  * shuffle-free only when the bucket counts are equal or multiples); at
  * 100 TB pick buckets so one bucket ~ one task's memory budget.
  */
object Bucketing {

  private val ids = new AtomicInteger(0)

  /** Write `df` as a bucketed + sorted external parquet table under the
    * session scratch root and return it re-read THROUGH the catalog (only
    * catalog reads carry bucket metadata — a plain parquet read of the
    * same files would forget the distribution).
    */
  def writeBucketed(df: DataFrame, key: String, buckets: Int): DataFrame = {
    val spark = df.sparkSession
    val name = s"graft_bkt_${key}_${ids.incrementAndGet()}"
    df.write.mode("overwrite")
      .option("path", Scratch.dir(s"bkt_${key}_"))
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(name)
    spark.table(name)
  }

  /** Per-order revenue rollup over bucketed orders ⋈ bucketed lineitem:
    * lineitem pre-aggregates on its bucket key (no exchange — the scan's
    * hash distribution already matches the grouping), then merge-joins
    * orders (no exchange, no sort — both scans are bucketed AND sorted on
    * the key). Decimal sums keep the oracle hash exact. `orders diff` runs
    * nightly in the reference; this is the shape that makes the Spark
    * version shuffle-free on every run after the first.
    */
  def colocatedRevenue(orders: DataFrame, lineitem: DataFrame,
                       buckets: Int = 8): DataFrame = {
    val bo = writeBucketed(
      orders.select("o_orderkey", "o_totalprice"), "o_orderkey", buckets)
    val bl = writeBucketed(
      lineitem.select("l_orderkey", "l_extendedprice", "l_discount"),
      "l_orderkey", buckets)
    val dec = (c: String) => col(c).cast("decimal(18,2)")
    val rev = bl.groupBy("l_orderkey").agg(
      count(lit(1)).as("n_items"),
      sum((dec("l_extendedprice") * (lit(1).cast("decimal(18,2)") - dec("l_discount")))
        .cast("decimal(30,4)")).cast("double").as("revenue"))
    bo.join(rev, bo("o_orderkey") === rev("l_orderkey"))
      .select(col("o_orderkey"), col("o_totalprice"), col("n_items"), col("revenue"))
  }
}
