package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting (100 TB posture, builder brief): a hot
  * key that would overload one reducer is split across `salts` synthetic
  * sub-keys. AQE's skew-join handling covers sort-merge joins at runtime;
  * salting is the plan-level tool for skewed AGGREGATIONS and broadcast-
  * averse joins, and it composes with the commutative chunk checksums
  * (partial sums re-combine exactly).
  */
object Salt {

  /** Deterministic per-row salt in [0, salts): hash of the whole row,
    * NOT random — keeps plans replayable (no rand() in plans, SURVEY.md
    * §4 determinism note).
    */
  def saltCol(df: DataFrame, salts: Int): Column =
    pmod(xxhash64(df.columns.map(col).toSeq: _*), lit(salts))

  /** Two-phase skew-safe count per key: partial count per (key, salt),
    * then re-combine per key. Identical result to a direct groupBy count;
    * the first shuffle spreads a hot key over `salts` reducers.
    */
  def saltedCount(df: DataFrame, keyCol: String, salts: Int): DataFrame =
    df.withColumn("__salt", saltCol(df, salts))
      .groupBy(col(keyCol), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(keyCol))
      .agg(sum(col("__partial")).as("cnt"))

  /** Two-phase skew-safe sum — the salted form of the chunk-checksum
    * aggregate (A1): commutative sums re-combine exactly.
    */
  def saltedSum(df: DataFrame, keyCol: String, valueCol: String,
                salts: Int): DataFrame =
    df.withColumn("__salt", saltCol(df, salts))
      .groupBy(col(keyCol), col("__salt"))
      .agg(sum(col(valueCol)).as("__partial"))
      .groupBy(col(keyCol))
      .agg(sum(col("__partial")).as("sum"))

  /** Skewed equi-join: salt the big (skewed) side, replicate the small
    * side once per salt value, join on (key, salt). Result equals the
    * plain join; each hot-key partition shrinks by `salts`x.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salts: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt", saltCol(big, salts))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1)).cast("array<bigint>")))
    saltedBig.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Heavy-hitter diagnostic: the top `k` keys by row count with each
    * key's share of the relation — the measurement that DECIDES when the
    * salting above (or AQE skew handling) is needed, and which keys to
    * target. The full-table count collapses to one row per key with
    * map-side partials before the whole-relation share window touches it,
    * so the single-partition window sees |keys| rows, never |rows|; the
    * top-k is a TakeOrderedAndProject, no full sort.
    */
  def keyStats(df: DataFrame, keyCol: String, k: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val whole = Window.partitionBy()
    df.groupBy(keyCol).agg(count(lit(1)).as("cnt"))
      .withColumn("share",
        round(col("cnt").cast("double") / sum(col("cnt")).over(whole), 6))
      .orderBy(col("cnt").desc, col(keyCol).asc)
      .limit(k)
  }
}
