package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter runtime pruning for big-probe/small-build joins — the
  * shuffle-avoidance pattern a 100 TB compare needs: before shuffling the
  * probe side on the join key, drop every probe row whose key CANNOT be on
  * the build side.
  *
  * Spark's own runtime row-level filtering injects this shape when
  * statistics justify it; this operator makes the pattern explicit,
  * deterministic, and available to compositions the injection rules skip
  * (e.g. a build side derived through a filter Catalyst can't estimate).
  *
  * Construction:
  *  - build side → k=3 hash positions per key (`xxhash64(key, seed)`
  *    pmod m) → groupBy word index → `bit_or` of single-bit words. The
  *    driver collect is bounded BY CONSTRUCTION at m/64 rows (default
  *    2048 longs = 16 KiB) — independent of build cardinality, so there is
  *    no unbounded-collect scale hazard; a saturated filter degrades to
  *    "prune nothing", never to wrong answers.
  *  - the bitmap ships as ONE `typedlit` array literal (a single Catalyst
  *    `Literal` carrying ArrayData, codegen-friendly — NOT a 2048-child
  *    `CreateArray`), and the probe-side membership test is three
  *    codegen'd element_at/shiftright/mask terms AND-ed together
  *    (`shiftright` with a non-literal shift amount is reached through the
  *    SQL form — the `functions.shiftright` overload only takes Int).
  *  - the equi-join that follows removes any false positives, so the final
  *    relation is bit-identical to the unpruned join. That identity IS the
  *    oracle check for `bloom_prune_join`: no false negatives by Bloom
  *    construction, no false positives past the join.
  *
  * At 1000 executors the win is shuffle-write volume: probe rows failing
  * the membership test die in the scan stage, before exchange.
  */
object BloomPrune {

  /** Number of 64-bit words backing an `mBits`-bit filter. */
  private def words(mBits: Int): Int = {
    require(mBits >= 64 && Integer.bitCount(mBits) == 1,
      "mBits must be a power of two >= 64")
    mBits / 64
  }

  private def positions(key: Column, mBits: Int): Seq[Column] =
    (1 to 3).map(seed => pmod(xxhash64(key, lit(seed)), lit(mBits.toLong)))

  /** Build the bitmap: Array[Long] of length mBits/64, bit p set iff some
    * build key hashes to p under one of the 3 seeds. Bounded collect. */
  def buildBitmap(build: DataFrame, keyCol: String,
                  mBits: Int = 1 << 17): Array[Long] = {
    val n = words(mBits)
    val key = col(keyCol)
    val pos = explode(array(positions(key, mBits): _*)).as("p")
    val rows = build.filter(key.isNotNull)
      .select(pos)
      .select((col("p") / 64).cast("int").as("word_idx"),
        expr("shiftleft(1L, CAST(p % 64 AS INT))").as("bit"))
      .groupBy("word_idx").agg(bit_or(col("bit")).as("w"))
      .collect() // <= mBits/64 rows by construction — hard bound, not data
    val bm = new Array[Long](n)
    rows.foreach(r => bm(r.getInt(0)) = r.getLong(1))
    bm
  }

  /** `df` filtered to rows whose `keyCol` might be in the filter: every
    * one of the 3 hash positions has its bit set. Null keys are dropped
    * (the inner join downstream drops them anyway). Temp columns carry the
    * hash positions so the dynamic-shift bit test can name its operands
    * in SQL form; they are pruned from the result. */
  def applyFilter(df: DataFrame, keyCol: String, bm: Array[Long],
                  mBits: Int): DataFrame = {
    require(bm.length == words(mBits), "bitmap length != mBits/64")
    val pos = positions(col(keyCol), mBits)
    val tagged = df
      .withColumn("__graft_bm", typedlit(bm.toSeq))
      .withColumn("__graft_p1", pos(0))
      .withColumn("__graft_p2", pos(1))
      .withColumn("__graft_p3", pos(2))
    val test = (1 to 3).map { i =>
      s"""(shiftright(element_at(__graft_bm,
         |   CAST(__graft_p$i DIV 64 AS INT) + 1),
         |   CAST(__graft_p$i % 64 AS INT)) & 1L) = 1L""".stripMargin
    }.mkString("(", ") AND (", ")")
    tagged
      .filter(col(keyCol).isNotNull && expr(test))
      .drop("__graft_bm", "__graft_p1", "__graft_p2", "__graft_p3")
  }

  /** `probe ⋈ build` on `probeKey = buildKey`, with the probe side
    * pre-filtered through a Bloom filter built from the build side's keys.
    * Result is identical to the plain inner equi-join. */
  def prunedJoin(probe: DataFrame, build: DataFrame,
                 probeKey: String, buildKey: String,
                 mBits: Int = 1 << 17): DataFrame = {
    val bm = buildBitmap(build, buildKey, mBits)
    applyFilter(probe, probeKey, bm, mBits)
      .join(build, col(probeKey) === col(buildKey))
  }
}
