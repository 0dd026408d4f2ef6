package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Per-shard Bloom-filter MANIFEST — the membership index that makes
  * incremental ingest skip shards at 100 TB.
  *
  * [[BloomPrune]] builds ONE filter on the driver and broadcasts it —
  * right for pruning a join probe side against one bounded build side.
  * This operator is the other deployment shape: the corpus is sharded
  * (source, date, bucket), each shard gets its own fixed-width Bloom
  * bitmap, and the manifest is itself a TABLE — (shard, word, bits)
  * rows — so filter count scales with shard count, nothing is
  * collected, and an incoming batch decides per shard whether any of
  * its keys might live there (the standard LSM/lakehouse file-skipping
  * index, relationally). No false negatives by construction; false
  * positives only cost a wasted shard visit, measured by the probe
  * face's `n_maybe - n_present` gap.
  *
  * Layout: `words` 60-bit words per shard (the sign bit and bits 60-62
  * stay clear, so bit arithmetic never touches two's-complement edge
  * cases in either engine). k = 3 probe positions per key, each an
  * independently SALTED md5-derived 48-bit hash mod (words*60) — salts,
  * not multiplied hashes, so every intermediate stays far from int64
  * overflow (DuckDB throws on overflow where Spark wraps; the oracle
  * must compute the identical lane).
  *
  * Scale posture: positions explode to 3 narrow (shard, pos) rows per
  * key; the bitmap assembles with `bit_or` — commutative/associative,
  * so Catalyst plans map-side partial aggregation and the exchange
  * carries ≤ words rows per shard per map task. Words no key hashed
  * into are ABSENT from the manifest (sparse), deterministically.
  */
object BloomManifest {

  /** Bits per bitmap word — see layout note above. */
  val WordBits = 60

  /** k=3 salted probe positions of `keyCol` in a `words*60`-bit space. */
  private def positions(keyCol: String, words: Int) = (0 until 3).map { i =>
    pmod(
      conv(substring(md5(concat(lit(s"bm$i:"), col(keyCol).cast("string"))),
        1, 12), 16, 10).cast(LongType),
      lit((words * WordBits).toLong))
  }

  /** The manifest relation: (shard, word, bits, set_bits) — one row per
    * shard per word with at least one bit set.
    */
  def manifest(rows: DataFrame, shardCol: String, keyCol: String,
               words: Int = 17): DataFrame =
    rows
      .select(col(shardCol).as("shard"),
        explode(array(positions(keyCol, words): _*)).as("pos"))
      .select(col("shard"), expr(s"pos div $WordBits").as("word"),
        expr(s"shiftleft(CAST(1 AS BIGINT), CAST(pos % $WordBits AS INT))")
          .as("mask"))
      .groupBy("shard", "word")
      .agg(expr("bit_or(mask)").as("bits"))
      .select(col("shard"), col("word"), col("bits"),
        bit_count(col("bits")).cast(LongType).as("set_bits"))

  /** Probe face: for each (shard, probe key), `maybe` = all 3 bits set
    * in that shard's manifest. Aggregated per shard alongside ground
    * truth (`present` = the key really is in the shard), so the output
    * carries the Bloom contract itself: n_present ≤ n_maybe ≤ n_probes,
    * and the false-positive rate is the observable n_maybe − n_present.
    *
    * The probe join is (shard, word) equi — manifest-sized build side,
    * AQE broadcasts it when it fits; a missing manifest word is a clear
    * bit (coalesce 0), which is what makes sparse storage correct.
    */
  def probe(probes: DataFrame, corpus: DataFrame, manifestDf: DataFrame,
            shardCol: String, keyCol: String,
            words: Int = 17): DataFrame = {
    val exploded = probes
      .select(col(shardCol).as("shard"), col(keyCol).as("key"),
        explode(array(positions(keyCol, words): _*)).as("pos"))
      .select(col("shard"), col("key"),
        expr(s"pos div $WordBits").as("word"),
        expr(s"shiftleft(CAST(1 AS BIGINT), CAST(pos % $WordBits AS INT))")
          .as("mask"))
    val checked = exploded
      .join(manifestDf.select(col("shard"), col("word"), col("bits")),
        Seq("shard", "word"), "left")
      .groupBy("shard", "key")
      .agg(min((coalesce(col("bits"), lit(0L))
        .bitwiseAND(col("mask")) =!= 0L).cast(LongType)).as("maybe"))
    val truth = corpus
      .select(col(shardCol).as("shard"), col(keyCol).as("key"),
        lit(1L).as("present"))
      .distinct()
    checked
      .join(truth, Seq("shard", "key"), "left")
      .groupBy("shard")
      .agg(count(lit(1)).as("n_probes"),
        sum(col("maybe")).as("n_maybe"),
        sum(coalesce(col("present"), lit(0L))).as("n_present"))
  }
}
