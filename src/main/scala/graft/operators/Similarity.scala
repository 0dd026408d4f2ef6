package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`) — the
  * training-data-pipeline ANN surface (north-star extension).
  *
  * Two paths:
  *  - [[bruteForceTopK]] / [[nearDupPairs]]: exact cosine — the
  *    correctness baseline.
  *  - [[signLshTopK]]: sign-LSH bucketed ANN — the 100 TB path. Bucket =
  *    sign bits of the leading dimensions (a deterministic degenerate
  *    random-hyperplane LSH: hyperplanes = coordinate axes). Candidates
  *    co-bucket only, so per-query work drops from N to the bucket size;
  *    at scale, buckets shard the corpus and pairing keys on bucket id.
  *
  * Physical strategy: Spark's BroadcastNestedLoopJoin — the planner's
  * only option for a non-equi pair predicate — does NOT participate in
  * whole-stage codegen, so an expression-based pair loop runs fully
  * interpreted (measured ~8x slower even after unrolling). The pair
  * stage here is therefore a hand-fused kernel: candidate vectors are
  * broadcast once as primitive double arrays and each partition scores
  * its rows in a tight JVM loop (`mapPartitions`) — the same
  * broadcast-hash-side shape the BNLJ would build, minus interpretation
  * overhead. This is the documented last-resort case (SURVEY.md §7.3):
  * the operator's semantics are not expressible as an equi-join.
  *
  * Determinism/oracle contract: floats are promoted to double BEFORE any
  * arithmetic, sums fold left-to-right, and rounding replicates Spark's
  * `round(_, 6)` (BigDecimal HALF_UP over Double.toString) — so scores
  * are bit-identical to the declarative [[cosine]] expression and to the
  * DuckDB oracle's `list_sum` fold. Ranking ties break on candidate id.
  */
object Similarity {

  /** Left-fold double dot product of two float-array columns (dynamic
    * length — higher-order functions, interpreted per element).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Static-dimension dot product: an unrolled left-associated sum of
    * `dim` products — a flat codegen'd expression (no array lambdas in
    * the hot pair loop; ~10x over the HOF form). Same left-to-right
    * addition order as [[dot]], so scores stay bit-identical.
    */
  def dotN(a: Column, b: Column, dim: Int): Column =
    (1 to dim).map(i =>
      element_at(a, i).cast("double") * element_at(b, i).cast("double"))
      .reduceLeft(_ + _)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def normN(a: Column, dim: Int): Column = sqrt(dotN(a, a, dim))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Embedding dimensionality probed from the data (schemas don't carry
    * array lengths); one metadata-cheap first-row action.
    */
  def dimOf(embeddings: DataFrame): Int =
    embeddings.select(size(col("embedding"))).head().getInt(0)

  // ------------------------------------------------ fused kernel internals

  /** Exact replica of Spark's round(double, 6): BigDecimal.valueOf
    * (canonical Double.toString) + HALF_UP.
    */
  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Left-to-right double dot — the JVM twin of [[dotN]]. */
  private def dotJ(a: Array[Double], b: Array[Double]): Double = {
    var s = 0d; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  private case class Vec(id: Long, v: Array[Double], norm: Double, bucket: Long)

  /** Collect candidates once into a broadcastable primitive form (the
    * same driver-side build a broadcast join performs). `bits` > 0 also
    * derives the sign bucket from the ORIGINAL float values.
    */
  private def collectVecs(embeddings: DataFrame, bits: Int): Array[Vec] = {
    import org.apache.spark.sql.Row
    embeddings.select(col("vec_id"), col("embedding")).collect().map {
      case Row(id: Long, e: scala.collection.Seq[_]) =>
        val f = e.asInstanceOf[scala.collection.Seq[Float]].toArray
        val d = f.map(_.toDouble)
        var n2 = 0d; var i = 0
        while (i < d.length) { n2 += d(i) * d(i); i += 1 }
        var bucket = 0L
        var b = 0
        while (b < bits) { if (f(b) > 0f) bucket |= (1L << b); b += 1 }
        Vec(id, d, math.sqrt(n2), bucket)
    }.sortBy(_.id)
  }

  private val scoredSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("left_id", org.apache.spark.sql.types.LongType, false),
    org.apache.spark.sql.types.StructField("cand_id", org.apache.spark.sql.types.LongType, false),
    org.apache.spark.sql.types.StructField("score", org.apache.spark.sql.types.DoubleType, false)))

  /** Score stream rows against the broadcast candidates in partition-local
    * kernel loops. `pairOriented` keeps only left < cand (near-dup pairs);
    * otherwise all non-self candidates (top-k input), bucket-gated when
    * bits > 0.
    */
  private def kernelScores(stream: DataFrame, embeddings: DataFrame,
                           bits: Int, pairOriented: Boolean): DataFrame = {
    val spark = embeddings.sparkSession
    val bc = spark.sparkContext.broadcast(collectVecs(embeddings, bits))
    val out = stream.select(col("vec_id"), col("embedding")).rdd.mapPartitions { it =>
      val cands = bc.value
      it.flatMap { row =>
        val id = row.getLong(0)
        val f = row.getSeq[Float](1).toArray
        val d = f.map(_.toDouble)
        var n2 = 0d; var i = 0
        while (i < d.length) { n2 += d(i) * d(i); i += 1 }
        val n = math.sqrt(n2)
        var bucket = 0L
        var b = 0
        while (b < bits) { if (f(b) > 0f) bucket |= (1L << b); b += 1 }
        cands.iterator
          .filter(c =>
            (if (pairOriented) id < c.id else id != c.id) &&
              (bits == 0 || c.bucket == bucket))
          .map(c => org.apache.spark.sql.Row(
            id, c.id, round6(dotJ(d, c.v) / (n * c.norm))))
      }
    }
    spark.createDataFrame(out, scoredSchema)
  }

  /** Exact cosine top-k: for each query vector (query predicate selects a
    * small set), the k nearest other vectors. Rank on (rounded score desc,
    * candidate id asc).
    */
  def bruteForceTopK(embeddings: DataFrame, queryPred: Column, k: Int): DataFrame = {
    val q = graft.Tables.spread(embeddings).filter(queryPred)
    val scored = kernelScores(q, embeddings, bits = 0, pairOriented = false)
      .withColumnRenamed("left_id", "query_id")
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
    val q = graft.Tables.spread(embeddings).filter(queryPred)
    val scored = kernelScores(q, embeddings, bits = bits, pairOriented = false)
      .withColumnRenamed("left_id", "query_id")
    topK(scored, k)
  }

  /** IVF (inverted-file) ANN top-k — the classic coarse-quantizer scale
    * path next to [[signLshTopK]]: a deterministic centroid set (the
    * `nCentroids` lowest vec_ids — a seeded k-means would slot in here;
    * determinism is the engine contract, SURVEY.md §4), every vector
    * assigned to its nearest centroid (the inverted lists), and each
    * query probing only the `nProbe` nearest lists. Per-query work drops
    * from N to nProbe x listSize.
    *
    * Assignment/probe ordering uses UNROUNDED cosine with centroid-id
    * tie-break; only emitted scores are rounded — the oracle mirrors both
    * orderings exactly. At 100 TB, assignment is one narrow distributed
    * pass against broadcast centroids and the lists are a bucketed table;
    * here the collected candidate array doubles as the lists.
    */
  def ivfTopK(embeddings: DataFrame, queryPred: Column, k: Int,
              nCentroids: Int = 16, nProbe: Int = 2): DataFrame = {
    val spark = embeddings.sparkSession
    val all = collectVecs(embeddings, bits = 0)
    val cents = all.filter(_.id < nCentroids)
    def nearestCids(v: Array[Double], n: Double, take: Int): Seq[Long] =
      cents.map(c => (dotJ(v, c.v) / (n * c.norm), c.id))
        .sortBy { case (s, cid) => (-s, cid) }.take(take).map(_._2).toSeq
    val assigned: Map[Long, Array[Vec]] =
      all.groupBy(v => nearestCids(v.v, v.norm, 1).head)
    val bc = spark.sparkContext.broadcast((cents, assigned))
    val out = graft.Tables.spread(embeddings).filter(queryPred)
      .select(col("vec_id"), col("embedding")).rdd.mapPartitions { it =>
        val (cs, lists) = bc.value
        it.flatMap { row =>
          val id = row.getLong(0)
          val d = row.getSeq[Float](1).toArray.map(_.toDouble)
          var n2 = 0d; var i = 0
          while (i < d.length) { n2 += d(i) * d(i); i += 1 }
          val n = math.sqrt(n2)
          val probes = cs.map(c => (dotJ(d, c.v) / (n * c.norm), c.id))
            .sortBy { case (s, cid) => (-s, cid) }.take(nProbe).map(_._2)
          probes.iterator
            .flatMap(cid => lists.getOrElse(cid, Array.empty[Vec]).iterator)
            .filter(_.id != id)
            .map(c => (c.id, round6(dotJ(d, c.v) / (n * c.norm))))
            .toSeq
            .sortBy { case (cid, s) => (-s, cid) }
            .take(k)
            .zipWithIndex
            .map { case ((cid, s), r) =>
              org.apache.spark.sql.Row(id, cid, s, r + 1)
            }
        }
      }
    spark.createDataFrame(out, org.apache.spark.sql.types.StructType(
      scoredSchema.fields :+ org.apache.spark.sql.types.StructField(
        "rank", org.apache.spark.sql.types.IntegerType, nullable = false)))
      .withColumnRenamed("left_id", "query_id")
  }

  /** Exact cosine near-duplicate pairs (id-oriented, thresholded) — the
    * embedding-space analogue of [[Dedup.jaccardNearDups]]. Brute force
    * here; the scale path buckets first ([[signBucket]]) and verifies
    * within buckets.
    */
  def nearDupPairs(embeddings: DataFrame, threshold: Double): DataFrame =
    kernelScores(graft.Tables.spread(embeddings), embeddings,
      bits = 0, pairOriented = true)
      .withColumnRenamed("left_id", "id_a")
      .withColumnRenamed("cand_id", "id_b")
      .filter(col("score") >= threshold)

  private def topK(scored: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("score").desc, col("cand_id"))))
      .filter(col("rank") <= k)
  }
}
