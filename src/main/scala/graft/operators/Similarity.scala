package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`) — the
  * training-data-pipeline ANN surface (north-star extension).
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact cosine top-k — the correctness baseline.
  *    Query side broadcast (small), candidate side streamed; the scored
  *    relation is |Q| x N rows of (ids, score) only — embeddings never
  *    shuffle.
  *  - [[signLshTopK]]: sign-LSH bucketed ANN — the 100 TB path. Bucket =
  *    sign bits of the leading dimensions (a deterministic degenerate
  *    random-hyperplane LSH: hyperplanes = coordinate axes). Candidates
  *    co-bucket only, so per-query work drops from N to the bucket size;
  *    at scale, buckets shard the corpus and the broadcast join keys on
  *    the bucket id.
  *
  * All float math is promoted to double BEFORE any arithmetic and folded
  * left-to-right (both `aggregate` here and the oracle's `list_sum` are
  * sequential left folds) so scores are bit-identical across engines;
  * ranking uses round(score, 6) with id tie-break for determinism.
  */
object Similarity {

  /** Left-fold double dot product of two float-array columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact cosine top-k: for each query vector (query predicate selects a
    * small set), the k nearest other vectors. Rank on (rounded score desc,
    * candidate id asc).
    */
  def bruteForceTopK(embeddings: DataFrame, queryPred: Column, k: Int): DataFrame = {
    val q = embeddings.filter(queryPred)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val c = embeddings
      .select(col("vec_id").as("cand_id"), col("embedding").as("ce"))
    val scored = q.join(broadcast(c), col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"),
        round(cosine(col("qe"), col("ce")), 6).as("score"))
    topK(scored, k)
  }

  /** Sign-LSH bucket id: `bits` sign bits of the leading dimensions. */
  def signBucket(e: Column, bits: Int): Column =
    (0 until bits).map { i =>
      when(element_at(e, i + 1) > 0f, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Bucketed ANN top-k: candidates share the query's sign bucket. */
  def signLshTopK(embeddings: DataFrame, queryPred: Column, k: Int,
                  bits: Int = 6): DataFrame = {
    val withB = embeddings.withColumn("bucket", signBucket(col("embedding"), bits))
    val q = withB.filter(queryPred)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"), col("bucket"))
    val c = withB
      .select(col("vec_id").as("cand_id"), col("embedding").as("ce"), col("bucket"))
    val scored = q.join(broadcast(c), Seq("bucket"))
      .filter(col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"),
        round(cosine(col("qe"), col("ce")), 6).as("score"))
    topK(scored, k)
  }

  /** Exact cosine near-duplicate pairs (id-oriented, thresholded) — the
    * embedding-space analogue of [[Dedup.jaccardNearDups]]. Brute force
    * here; the scale path buckets first ([[signBucket]]) and verifies
    * within buckets.
    */
  def nearDupPairs(embeddings: DataFrame, threshold: Double): DataFrame = {
    val a = embeddings.select(col("vec_id").as("id_a"), col("embedding").as("ea"))
    val b = embeddings.select(col("vec_id").as("id_b"), col("embedding").as("eb"))
    a.join(broadcast(b), col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(cosine(col("ea"), col("eb")), 6).as("score"))
      .filter(col("score") >= threshold)
  }

  private def topK(scored: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("score").desc, col("cand_id"))))
      .filter(col("rank") <= k)
  }
}
