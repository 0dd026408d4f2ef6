package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Deterministic, engine-portable sketches.
  *
  * Spark's own `approx_count_distinct` is a HyperLogLog++ whose hash and
  * register layout are engine-private — useful, but unverifiable by an
  * external oracle and unstable across engines, so a migration can't
  * cross-check cardinalities. This HLL uses the engine's portable
  * md5-derived 48-bit hash ([[graft.functions.Canonical.hex48]] lane):
  * top 8 bits pick one of m=256 registers, the first-one position in the
  * low 40 bits is the rank, and the Flajolet et al. bias-corrected
  * harmonic estimate (with the small-range linear-counting branch) is
  * plain arithmetic — every step reproduces bit-for-bit in any engine
  * with md5, which is what makes the sketch ORACLE-TIER here.
  *
  * Scale posture: the register table is the whole state — at most
  * m rows per group after the first aggregation, so the sketch of a
  * 100 TB column is 256 longs per group, built with one map-side-combining
  * shuffle on (group, bucket) and merged with MAX (the HLL merge is the
  * register-wise max, which is exactly what the two-phase HashAggregate
  * does). The exact column rides along only to report the realized error;
  * a production caller drops it and keeps the one-pass sketch.
  */
object Sketches {

  val M = 256 // registers (b = 8 bucket bits)
  private val Pow40 = 1099511627776L // 2^40 — low-bit span below the bucket

  /** (bucket, rank) of one key under the portable hash — the JVM-side
    * mirror of the relational register derivation below, shared with the
    * streaming face so both produce IDENTICAL registers: bucket = top 8
    * of the 48 hash bits, rank = 1-based first-set-bit position in the
    * low 40 (41 when all-zero).
    */
  def registerOf(key: String): (Int, Int) = {
    val h = graft.functions.TextKernels.h48(key.getBytes("UTF-8"))
    val rem = h & (Pow40 - 1)
    val rho = if (rem == 0L) 41 else java.lang.Long.numberOfLeadingZeros(rem) - 23
    ((h >>> 40).toInt, rho)
  }

  /** Flajolet bias-corrected estimate from a register array — double
    * arithmetic in the SAME operation order as the relational form, and
    * the harmonic sum is a sum of powers of two spanning < 52 bits, so it
    * is EXACT regardless of accumulation order: the streaming face's
    * loop, this loop, and Spark's partial aggregation all produce the
    * identical double, which is why the batch/stream parity spec can
    * assert bit equality rather than a tolerance.
    */
  def estimateFromRegisters(regs: Array[Int]): Double = {
    var sumInv = 0.0
    var present = 0
    var i = 0
    while (i < regs.length) {
      if (regs(i) > 0) { present += 1; sumInv += math.pow(2.0, -regs(i)) }
      i += 1
    }
    val zeros = M - present
    val raw = (0.7213 / (1.0 + 1.079 / 256.0)) * (M.toDouble * M) / (sumInv + zeros)
    val est =
      if (raw <= 2.5 * M && zeros > 0) M.toDouble * math.log(M.toDouble / zeros)
      else raw
    BigDecimal(est).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  /** (grp, bucket, mreg) register relation — the sketch's entire state,
    * built in one map-side-combining shuffle; at most [[M]] rows per
    * group whatever the input size.
    */
  def registerRelation(df: DataFrame, keyCol: String,
                       groupCol: String): DataFrame = {
    val h = graft.functions.Canonical.hex48(md5(col(keyCol).cast("string")))
    // NULL keys are excluded, matching count(DISTINCT key) semantics —
    // without the filter the null row lands in a NULL register bucket,
    // inflating `present` (count counts it, sum skips it) and skewing
    // zeros/estimate while the exact lane ignores it.
    df.filter(col(keyCol).isNotNull)
      .select(col(groupCol).cast("string").as("grp"), h.as("__h"))
      .withColumn("bucket", expr(s"__h div ${Pow40}L"))
      .withColumn("rem", pmod(col("__h"), lit(Pow40)))
      // rank = 1-based position of the first set bit in the 40-bit
      // remainder; all-zero remainder saturates at 41. String-domain bit
      // scan (bin/lpad/instr) keeps both engines integer-exact.
      .withColumn("rho", when(col("rem") === 0L, lit(41))
        .otherwise(expr("instr(lpad(bin(rem), 40, '0'), '1')").cast("int")))
      .groupBy("grp", "bucket").agg(max(col("rho")).as("mreg"))
  }

  /** Estimates from a (grp, bucket, mreg) register relation. */
  private def estimates(registers: DataFrame): DataFrame = {
    val alphaM2 = (lit(0.7213) / (lit(1.0) + lit(1.079) / lit(256.0))) *
      lit((M.toDouble) * M)
    registers.groupBy("grp")
      .agg(sum(pow(lit(2.0), -col("mreg"))).as("sum_inv"),
        count(lit(1)).as("present"))
      .withColumn("zeros", lit(M.toLong) - col("present"))
      // absent registers contribute 2^-0 = 1 each to the harmonic sum
      .withColumn("raw", alphaM2 / (col("sum_inv") + col("zeros")))
      .withColumn("hll_estimate", round(
        when(col("raw") <= lit(2.5 * M) && col("zeros") > 0,
          lit(M.toDouble) * log(lit(M.toDouble) / col("zeros")))
          .otherwise(col("raw")), 4))
  }

  private def withExact(est: DataFrame, exact: DataFrame,
                        groupCol: String): DataFrame =
    est.join(exact, "grp")
      .select(col("grp").as(groupCol), col("exact_distinct"),
        col("hll_estimate"),
        floor(abs(col("hll_estimate") - col("exact_distinct")) * 1000.0 /
          col("exact_distinct")).cast(LongType).as("err_permille"))

  /** Per-`groupCol` HLL cardinality estimate of `keyCol`, with the exact
    * distinct count and realized permille error alongside.
    */
  def hllDistinct(df: DataFrame, keyCol: String, groupCol: String): DataFrame = {
    val exact = df.groupBy(col(groupCol).cast("string").as("grp"))
      .agg(countDistinct(col(keyCol)).as("exact_distinct"))
    withExact(estimates(registerRelation(df, keyCol, groupCol)), exact, groupCol)
  }

  /** [[hllDistinct]] plus an `__ALL__` row whose registers are MERGED
    * from the per-group registers (bucket-wise max) rather than rescanned
    * — the sketch's associativity as a relation: one corpus scan yields
    * every group's cardinality AND the union's. This is the property that
    * lets a 100 TB pipeline sketch per-partition/per-day and roll up
    * arbitrarily later without touching the data again. (The exact lane
    * does rescan — it exists only to report the realized error and is
    * dropped in production use.)
    */
  def hllRollup(df: DataFrame, keyCol: String, groupCol: String): DataFrame = {
    val regs = registerRelation(df, keyCol, groupCol)
    val merged = regs.groupBy("bucket").agg(max(col("mreg")).as("mreg"))
      .withColumn("grp", lit("__ALL__"))
      .select("grp", "bucket", "mreg")
    val exact = df.groupBy(col(groupCol).cast("string").as("grp"))
      .agg(countDistinct(col(keyCol)).as("exact_distinct"))
      .unionByName(df.agg(countDistinct(col(keyCol)).as("exact_distinct"))
        .withColumn("grp", lit("__ALL__")).select("grp", "exact_distinct"))
    withExact(estimates(regs.unionByName(merged)), exact, groupCol)
  }
}
