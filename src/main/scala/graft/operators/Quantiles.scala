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

  /** Quantile SKETCH by deterministic hash-Bernoulli sampling, with an
    * exact rank-error audit — the approximate path [[groupStats]]'
    * scaladoc promises for the scale where full per-group sorting stops
    * being the right plan. A row enters the sample iff the 48-bit md5 of
    * its id falls under `permille/1000` of the hash space; quantiles are
    * then the same integer-rank discrete selection as [[groupStats]],
    * taken over the sample.
    *
    * Why THIS sketch and not KLL/GK: the sample is a pure hash predicate,
    * so it is (a) deterministic and order-free — identical under any
    * partitioning, shuffle order, or engine, which a compaction-based
    * sketch is not (its state depends on merge order — an oracle-parity
    * and replay hazard); (b) MERGEABLE by construction — the sample of a
    * union is the union of samples, so shard sketches combine by
    * concatenation and an incremental batch just appends (the same
    * additive contract as the Bloom manifest); (c) auditable — the
    * estimate is a real data row, so its TRUE rank is one count over the
    * base relation away.
    *
    * Scale posture: the sampling pass is a narrow scan-speed filter (no
    * shuffle); the per-group sort only ever sees `permille/1000` of the
    * data — the knob that keeps million-row groups sortable in memory.
    * The audit join broadcasts the tiny estimate relation (one row per
    * group×quantile) back over the base — an accuracy-report pass a
    * production pipeline runs on a schedule, not per query. Expected
    * rank error is O(sqrt(n/permille·1000))/n; the output states the
    * measured error in exact integer ppm so the gate pins it.
    *
    * Output, one row per (group, q) — EVERY group of the base relation,
    * sampled or not: cnt, n_sample (0 when the group drew no sample),
    * est_v (the sampled discrete q-quantile; NULL for an unsampled
    * group — the explicit "no estimate" sentinel, never a silently
    * missing row), true_rank (exact rank of that row in the group's
    * (v, id) total order; NULL when unsampled), target_rank =
    * ceil(q·cnt/100), and err_ppm = |true_rank − target_rank|·1e6 div
    * cnt (NULL when unsampled). All-integer end to end — no float
    * enters the hashed surface. The id is hashed AS A STRING of the
    * original column (no numeric round-trip), so string-keyed tables
    * sample correctly instead of silently hashing NULL.
    */
  def sampleQuantiles(df: DataFrame, groupCol: String, idCol: String,
                      valueCol: String, permille: Int = 200,
                      qs: Seq[Int] = Seq(50, 90)): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 1 && q <= 100))
    val base = normalized(df, groupCol, idCol, valueCol)
    val est = quantilesFromSample(
      sampleOf(base, permille), qs)
    val grp = base.groupBy("g").agg(count(lit(1)).as("cnt"))
    val audit = base.join(broadcast(est), Seq("g"))
      .groupBy("g", "q", "n_sample", "est_v", "est_id")
      .agg(sum(when(col("v") < col("est_v") ||
          (col("v") === col("est_v") && col("id") <= col("est_id")), 1L)
          .otherwise(0L)).as("true_rank"))
    grp
      .withColumn("q", explode(array(qs.map(lit(_)): _*)))
      .join(broadcast(audit), Seq("g", "q"), "left")
      .select(col("g").as(groupCol), col("q"), col("cnt"),
        coalesce(col("n_sample"), lit(0L)).as("n_sample"),
        col("est_v"), col("true_rank"),
        expr("(q * cnt + 99) div 100").as("target_rank"),
        when(col("est_v").isNull, lit(null).cast("long"))
          .otherwise(
            expr("abs(true_rank - ((q * cnt + 99) div 100)) * 1000000 div cnt"))
          .as("err_ppm"))
  }

  private def normalized(df: DataFrame, groupCol: String, idCol: String,
                         valueCol: String): DataFrame =
    df.select(col(groupCol).as("g"), col(idCol).as("id"),
      col(valueCol).cast("long").as("v"))

  private def sampleOf(base: DataFrame, permille: Int): DataFrame = {
    require(permille >= 1 && permille <= 1000, "permille in [1, 1000]")
    // 2^48 · permille / 1000 — exact integer threshold on the 48-bit
    // hash lane (fits a long for every permille ≤ 1000).
    val thresh = ((BigInt(1) << 48) * permille / 1000).toLong
    base.filter(
      graft.functions.Canonical.hex48(
        md5(concat(lit("qs:"), col("id").cast("string")))) < lit(thresh))
  }

  /** The shard-local SAMPLE relation — (g, id, v) rows passing the pure
    * row-hash gate. This IS the sketch state: shard sketches merge by
    * plain UNION of their sample relations (the gate is a per-row hash,
    * so sample(A ∪ B) = sample(A) ∪ sample(B) exactly), and an
    * incremental batch just appends its own sample — no rescan of
    * standing data. [[quantilesFromSample]] extracts estimates from any
    * such union; `quantile_sketch_merge` proves the algebra against a
    * one-pass oracle.
    */
  def sampleRelation(df: DataFrame, groupCol: String, idCol: String,
                     valueCol: String, permille: Int = 200): DataFrame =
    sampleOf(normalized(df, groupCol, idCol, valueCol), permille)

  /** Discrete q-quantile estimates from a (g, id, v) sample relation
    * (one row per (g, q) that has ≥1 sample row): n_sample, est_v,
    * est_id — the same integer ceil-rank selection as [[groupStats]],
    * taken over the sample.
    */
  def quantilesFromSample(sample: DataFrame,
                          qs: Seq[Int] = Seq(50, 90)): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 1 && q <= 100))
    val wv = Window.partitionBy("g").orderBy(col("v").asc, col("id").asc)
    sample
      .withColumn("__rn", row_number().over(wv))
      .withColumn("__ns", count(lit(1)).over(Window.partitionBy("g")))
      .withColumn("q", explode(array(qs.map(lit(_)): _*)))
      .filter(col("__rn") === expr("(q * __ns + 99) div 100"))
      .select(col("g"), col("q"), col("__ns").as("n_sample"),
        col("v").as("est_v"), col("id").as("est_id"))
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
