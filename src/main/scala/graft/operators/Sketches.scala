package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Inclusion–exclusion set-intersection estimate from HLL registers:
    * |A∩B| ≈ est(A) + est(B) − est(A∪B), where the union's registers are
    * the bucket-wise MAX of A's and B's — sketch algebra, no rescan and
    * no join of the two populations. This is the cheap answer to "how
    * many customers/users/documents do these two partitions share?" at
    * 100 TB: the exact answer needs a distinct-intersection join across
    * both sides; the sketch answer needs 2×256 longs. Clamped at 0 (the
    * difference of three noisy estimates can go negative when the true
    * overlap is small). The exact lanes ride along to report the realized
    * error; inclusion–exclusion on the exact counts is itself exact, so
    * `exact_inter` needs no distinct-join either.
    *
    * `tagCol` must evaluate to 'A' or 'B' per row; rows tagged neither
    * are ignored.
    */
  def hllOverlap(df: DataFrame, keyCol: String, tagCol: Column): DataFrame = {
    val tagged = df.filter(col(keyCol).isNotNull && tagCol.isin("A", "B"))
      .select(tagCol.as("tag"), col(keyCol).as("k"))
    val r0 = registerRelation(tagged, "k", "tag")
    val ru = r0.groupBy("bucket").agg(max("mreg").as("mreg"))
      .withColumn("grp", lit("U")).select("grp", "bucket", "mreg")
    val wideEst = estimates(r0.unionByName(ru)).agg(
      max(when(col("grp") === "A", col("hll_estimate"))).as("est_a"),
      max(when(col("grp") === "B", col("hll_estimate"))).as("est_b"),
      max(when(col("grp") === "U", col("hll_estimate"))).as("est_union"))
      .withColumn("est_inter", round(
        greatest(col("est_a") + col("est_b") - col("est_union"), lit(0.0)), 4))
    val exact = tagged.agg(
      countDistinct(when(col("tag") === "A", col("k"))).as("exact_a"),
      countDistinct(when(col("tag") === "B", col("k"))).as("exact_b"),
      countDistinct(col("k")).as("exact_union"))
      .withColumn("exact_inter",
        col("exact_a") + col("exact_b") - col("exact_union"))
    // 1-row × 1-row attach on a data-derived zero key — a literal key
    // constant-folds into a BNLJ, which the plan audit forbids
    val l = wideEst.withColumn("j",
      pmod(floor(col("est_union")).cast(LongType), lit(1L)))
    val r = exact.withColumn("j", pmod(col("exact_union"), lit(1L)))
    l.join(r, "j").drop("j")
      .withColumn("inter_err_permille",
        when(col("exact_inter") > 0,
          floor(abs(col("est_inter") - col("exact_inter")) * lit(1000.0) /
            col("exact_inter")))
          .otherwise(lit(0)).cast(LongType))
      .select(col("exact_a"), col("est_a"), col("exact_b"), col("est_b"),
        col("exact_union"), col("est_union"),
        col("exact_inter"), col("est_inter"), col("inter_err_permille"))
  }

  // -------------------------------------------------------- count-min

  /** Count-min sketch width (buckets per depth) and depth (independent
    * hash rows). State is `CmsD * CmsW` = 4096 counters per group — the
    * POINT of the sketch: per-key frequency estimates over a keyspace of
    * any cardinality (every token of a 100 TB corpus, every user of a
    * year of events) in constant memory, where the exact `groupBy(key)`
    * would shuffle and hold one row per distinct key.
    */
  val CmsW = 1024L
  val CmsD = 4

  /** The d (depth, bucket) cells one key hashes into — one md5 per depth,
    * salted `"d:key"`, bucketed into the low bits of the portable 48-bit
    * lane. Same derivation the oracle replays in SQL, which is what makes
    * the ESTIMATES (not just the exact lane) cross-engine checkable.
    */
  private def cmsBuckets(key: Column): Column =
    array((0 until CmsD).map { d =>
      struct(lit(d).as("depth"),
        pmod(graft.functions.Canonical.hex48(
          md5(concat_ws(":", lit(d.toString), key.cast("string")))),
          lit(CmsW)).as("bucket"))
    }: _*)

  /** JVM-side mirror of [[cmsBuckets]] — the bucket each depth hashes a
    * key into, shared with the streaming face so both faces produce
    * IDENTICAL counters (the same batch/stream contract [[registerOf]]
    * anchors for the HLL).
    */
  def cmsCellsOf(key: String): Array[Int] =
    Array.tabulate(CmsD) { d =>
      (graft.functions.TextKernels.h48(
        s"$d:$key".getBytes("UTF-8")) % CmsW).toInt
    }

  /** (grp, depth, bucket, cnt) counter relation — the sketch's entire
    * state. One narrow explode (×[[CmsD]]) then one map-side-combining
    * shuffle on (grp, depth, bucket): whatever the input size, at most
    * 4096 rows per group cross the wire per map partition.
    */
  def cmsRelation(df: DataFrame, keyCol: String, groupCol: Column): DataFrame =
    df.filter(col(keyCol).isNotNull)
      .select(groupCol.cast("string").as("grp"),
        explode(cmsBuckets(col(keyCol))).as("db"))
      .select(col("grp"), col("db.depth").as("depth"),
        col("db.bucket").as("bucket"))
      .groupBy("grp", "depth", "bucket").agg(count(lit(1)).as("cnt"))

  /** Point-query: min over depths of the probed cells. Probes carry
    * (grp, key, exact_cnt); the probe side is k-bounded, so the equi-join
    * against the (≤ groups × 4096)-row counter relation broadcasts. A
    * probed key always hits all d of its cells (its own occurrences are
    * counted there), so the inner join loses nothing; collisions only
    * ever ADD mass, hence `over_permille` is the sketch's one-sided error
    * and is provably ≥ 0 (the property [[SketchesSpec]] pins for every
    * key, not just the probed ones).
    */
  private def cmsEstimate(probes: DataFrame, keyCol: String,
                          regs: DataFrame): DataFrame =
    probes.withColumn("db", explode(cmsBuckets(col(keyCol))))
      .select(col("grp"), col(keyCol), col("exact_cnt"),
        col("db.depth").as("depth"), col("db.bucket").as("bucket"))
      .join(regs, Seq("grp", "depth", "bucket"))
      .groupBy(col("grp"), col(keyCol), col("exact_cnt"))
      .agg(min(col("cnt")).as("cms_estimate"))
      .withColumn("over_permille",
        floor((col("cms_estimate") - col("exact_cnt")) * lit(1000.0) /
          col("exact_cnt")).cast(LongType))

  /** Top-k exact heavy hitters of `keyCol` with their count-min estimates
    * and realized one-sided error. The exact lane rides along only to
    * report that error (as in [[hllDistinct]]); the production caller at
    * 100 TB keeps the 4096-counter sketch and probes candidate keys
    * without ever materializing the exact per-key counts.
    */
  def cmsHeavyHitters(df: DataFrame, keyCol: String, k: Int = 10): DataFrame = {
    val regs = cmsRelation(df, keyCol, lit("__ALL__"))
    val probes = df.filter(col(keyCol).isNotNull)
      .groupBy(col(keyCol)).agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col(keyCol))
      .limit(k) // TakeOrdered — no global sort materializes
      .withColumn("grp", lit("__ALL__"))
    cmsEstimate(probes, keyCol, regs)
      .select(col(keyCol), col("exact_cnt"), col("cms_estimate"),
        col("over_permille"))
      .orderBy(col("exact_cnt").desc, col(keyCol))
  }

  /** Per-`groupCol` sketches plus an `__ALL__` sketch MERGED by
    * bucket-wise SUM of the per-group counters — no second scan: the CMS
    * counterpart of [[hllRollup]]'s register-max merge. Sum-associativity
    * is what lets a pipeline sketch per shard/day and roll up arbitrarily
    * later. Each group (and the rollup) probes its top-1 key, so the
    * output pins both the per-group and the merged estimates.
    */
  def cmsRollup(df: DataFrame, keyCol: String, groupCol: String): DataFrame = {
    val regs = cmsRelation(df, keyCol, col(groupCol))
    val merged = regs.groupBy("depth", "bucket").agg(sum("cnt").as("cnt"))
      .withColumn("grp", lit("__ALL__"))
      .select("grp", "depth", "bucket", "cnt")
    val counts = df.filter(col(keyCol).isNotNull)
      .groupBy(col(groupCol).cast("string").as("grp"), col(keyCol))
      .agg(count(lit(1)).as("exact_cnt"))
      .unionByName(df.filter(col(keyCol).isNotNull)
        .groupBy(col(keyCol)).agg(count(lit(1)).as("exact_cnt"))
        .withColumn("grp", lit("__ALL__"))
        .select(col("grp"), col(keyCol), col("exact_cnt")))
    // top-1 key per group over the ALREADY-AGGREGATED counts relation —
    // the window partitions a (groups × keys)-sized input, not the corpus
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("grp").orderBy(col("exact_cnt").desc, col(keyCol))
    val probes = counts.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
    cmsEstimate(probes, keyCol, regs.unionByName(merged))
      .select(col("grp").as(groupCol), col(keyCol), col("exact_cnt"),
        col("cms_estimate"), col("over_permille"))
      .orderBy(groupCol)
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
