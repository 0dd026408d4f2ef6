package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Small-file compaction planning — the table-maintenance pass every
  * 100 TB parquet lake runs continuously: group each partition's fragment
  * files into target-size output files, deterministically, WITHOUT moving
  * any data to plan it.
  *
  * The reference engine compares tables chunk by chunk (SURVEY §2.5 C1);
  * this is the inverse maintenance shape: given fragments (here: document
  * rows standing in for data files, sized by `n_chars`), assign each to a
  * compaction bin so every bin's payload lands near `targetBytes`. The
  * assignment is the streaming first-fit rule Iceberg/Delta compactors
  * use: walk fragments in id order, bin = floor(bytes-before-this / T) —
  * one pass, no knapsack, fully relational.
  *
  * Scale posture: ONE window, partitioned BY SOURCE (the physical
  * partition key) — never corpus-global, so a 1000-partition lake plans
  * 1000 independent streams; the summary groupBy reuses the same
  * partitioning. A fragment larger than `targetBytes` becomes its own
  * oversized bin (flagged), never silently split: planning must not
  * invent rewrites the executor wouldn't perform.
  */
object Compaction {

  /** Per-(source, bin) compaction plan over fragment rows
    * (`idCol`, `sourceCol`, `sizeCol`): fragment count, payload bytes,
    * id range, and an `oversized` flag for single-fragment bins whose
    * payload exceeds the target. */
  def plan(fragments: DataFrame, sourceCol: String, idCol: String,
           sizeCol: String, targetBytes: Long): DataFrame = {
    require(targetBytes > 0, "targetBytes must be positive")
    val w = Window.partitionBy("source").orderBy("frag_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val binned = fragments
      .select(col(sourceCol).as("source"), col(idCol).as("frag_id"),
        col(sizeCol).cast("long").as("bytes"))
      .withColumn("cum_before", sum("bytes").over(w) - col("bytes"))
      .withColumn("bin", expr(s"cum_before DIV ${targetBytes}L"))
    binned.groupBy(col("source"), col("bin"))
      .agg(count(lit(1)).as("n_frags"),
        sum("bytes").as("bin_bytes"),
        min("frag_id").as("first_frag"),
        max("frag_id").as("last_frag"))
      .withColumn("oversized",
        col("n_frags") === 1 && col("bin_bytes") > lit(targetBytes))
      .orderBy("source", "bin")
  }
}
