package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, MetadataBuilder}

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

  /** Metadata key carrying the filter geometry on the `bits` column, so
    * a manifest self-describes the `words` it was built with — probing
    * or merging with a different `words` silently computes wrong bit
    * positions and breaks the no-false-negatives contract, so consumers
    * derive the value from here instead of trusting call sites to agree.
    * Column metadata survives select/join lineage AND a parquet
    * round-trip (Spark stores it in the file's schema property).
    */
  val WordsMetaKey = "bloom_words"

  /** The `words` a manifest was built with, from its `bits` column
    * metadata. `explicit` (when given) must agree — a mismatch is a
    * construction error, not a runtime data condition.
    */
  def manifestWords(manifestDf: DataFrame,
                    explicit: Option[Int] = None): Int = {
    val fromMeta = manifestDf.schema.fields.find(_.name == "bits")
      .filter(_.metadata.contains(WordsMetaKey))
      .map(_.metadata.getLong(WordsMetaKey).toInt)
    (fromMeta, explicit) match {
      case (Some(m), Some(e)) =>
        require(m == e,
          s"manifest built with words=$m but probe/merge called with words=$e")
        m
      case (Some(m), None) => m
      case (None, Some(e)) => e
      case (None, None) => throw new IllegalArgumentException(
        "manifest carries no bloom_words metadata and no explicit words " +
          "was given — cannot derive probe geometry")
    }
  }

  /** The manifest relation: (shard, word, bits, set_bits) — one row per
    * shard per word with at least one bit set. The `bits` column carries
    * `words` as metadata (see [[WordsMetaKey]]).
    */
  def manifest(rows: DataFrame, shardCol: String, keyCol: String,
               words: Int = 17): DataFrame = {
    val meta = new MetadataBuilder().putLong(WordsMetaKey, words).build()
    rows
      .select(col(shardCol).as("shard"),
        explode(array(positions(keyCol, words): _*)).as("pos"))
      .select(col("shard"), expr(s"pos div $WordBits").as("word"),
        expr(s"shiftleft(CAST(1 AS BIGINT), CAST(pos % $WordBits AS INT))")
          .as("mask"))
      .groupBy("shard", "word")
      .agg(expr("bit_or(mask)").as("bits"))
      .select(col("shard"), col("word"), col("bits").as("bits", meta),
        bit_count(col("bits")).cast(LongType).as("set_bits"))
  }

  /** Incremental maintenance — the additive twin of `dedup_incremental`:
    * a new batch's delta manifest merges into the standing manifest by
    * (shard, word) → bit_or, so ingest NEVER re-scans the standing
    * corpus. bit_or is commutative/associative/idempotent, therefore
    * merge(manifest(A), B) == manifest(A ∪ B) bit-for-bit — the oracle
    * for the merge face is literally the full-rebuild SQL. `words` is
    * derived from the standing manifest's metadata so the delta cannot
    * be built in a different bit space.
    */
  def merge(standing: DataFrame, batch: DataFrame,
            shardCol: String, keyCol: String): DataFrame = {
    val words = manifestWords(standing)
    val meta = new MetadataBuilder().putLong(WordsMetaKey, words).build()
    standing.select(col("shard"), col("word"), col("bits"))
      .unionByName(manifest(batch, shardCol, keyCol, words)
        .select(col("shard"), col("word"), col("bits")))
      .groupBy("shard", "word")
      .agg(expr("bit_or(bits)").as("bits"))
      .select(col("shard"), col("word"), col("bits").as("bits", meta),
        bit_count(col("bits")).cast(LongType).as("set_bits"))
  }

  /** Probe face: for each (shard, probe key), `maybe` = all 3 bits set
    * in that shard's manifest. Aggregated per shard alongside ground
    * truth (`present` = the key really is in the shard), so the output
    * carries the Bloom contract itself: n_present ≤ n_maybe ≤ n_probes,
    * and the false-positive rate is the observable n_maybe − n_present.
    *
    * The probe join is (shard, word) equi — manifest-sized build side,
    * AQE broadcasts it when it fits; a missing manifest word is a clear
    * bit (coalesce 0), which is what makes sparse storage correct.
    *
    * `words` defaults to the manifest's own metadata (see
    * [[manifestWords]]); passing an explicit value that disagrees throws
    * instead of silently probing the wrong bit space.
    */
  def probe(probes: DataFrame, corpus: DataFrame, manifestDf: DataFrame,
            shardCol: String, keyCol: String,
            wordsOpt: Option[Int] = None): DataFrame = {
    val words = manifestWords(manifestDf, wordsOpt)
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
