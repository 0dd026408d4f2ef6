package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`) — the
  * training-data-pipeline ANN surface (north-star extension).
  *
  * Three paths:
  *  - [[bruteForceTopK]] / [[nearDupPairs]]: exact cosine — the
  *    correctness baseline. The corpus STREAMS through the codegen'd
  *    [[graft.functions.CosineAll]] kernel (one static call per corpus
  *    row against all broadcast candidates — no join, no RDD hop);
  *    only the bounded query/pair side broadcasts, behind an explicit
  *    hard [[MaxBroadcastVecs]] guard — it IS the brute-force
  *    contract. Everything else bounds candidates structurally.
  *  - [[signLshTopK]] / [[nearDupPairsBucketed]]: sign-LSH bucketed ANN —
  *    the 100 TB path. Bucket = sign bits of the leading dimensions (a
  *    deterministic degenerate random-hyperplane LSH: hyperplanes =
  *    coordinate axes). Bucket equality is a plain equi-join key, so
  *    candidate generation is Catalyst join planning — a broadcast-hash
  *    join when one side is small (top-k queries), a bucket-shuffled join
  *    when both sides are the corpus (pair mining). No driver state.
  *  - [[ivfTopK]]: IVF coarse quantization — only the centroid array
  *    (small by construction) is broadcast; list assignment is one narrow
  *    distributed pass and probe×list pairing is an equi-join on the
  *    centroid id.
  *
  * Scoring stays inside whole-stage codegen: per-pair work after every
  * join is the native [[graft.functions.CosineScore]] expression (one
  * generated static call with a primitive loop) — no interpreted array
  * lambdas ([[dot]]) in the hot path, no dim-unrolled expression trees
  * that overflow codegen (ADVICE r03), and no BroadcastNestedLoopJoin
  * (the planner's non-codegen fallback for non-equi pair predicates)
  * anywhere: every pairing above is an equi-join. [[dotN]]/[[normN]]
  * remain for the once-per-ROW norm projection, where the unrolled form
  * is small and codegen-friendly.
  *
  * Determinism/oracle contract: floats are promoted to double BEFORE any
  * arithmetic, sums fold left-to-right, and emitted scores round via
  * Spark's `round(_, 6)` (BigDecimal HALF_UP over Double.toString) — the
  * JVM kernel's [[round6]] replicates it exactly, so the kernel and
  * declarative paths are bit-identical to each other and to the DuckDB
  * oracle's `list_sum` fold. Ranking ties break on candidate id.
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

  /** L2 norm over the first `dim` elements — kernel-backed
    * ([[graft.functions.LshKernels]], VERDICT r14 #3): the unrolled
    * sqrt(dotN) form is a ~500-node tree at d=64 whose per-plan janino
    * compile dominated the sub-second ANN faces; the native call is
    * bit-identical (same left-to-right IEEE fold, ParitySpec-pinned)
    * and one node. Falls back to the unrolled form when no session is
    * active to register against (value-identical by the same
    * contract).
    *
    * Session-registry caveat (r15 self-review #6): a pure Column
    * builder can't see the DataFrame's session, so registration goes
    * to the ACTIVE session — the right one everywhere in this repo
    * (one session per JVM; spec-asserted). A caller resolving the
    * plan against a DIFFERENT `newSession()` must register there
    * ([[graft.functions.LshKernels.register]]) or build sessions with
    * [[graft.GraftExtensions]], which injects every graft kernel.
    */
  def normN(a: Column, dim: Int): Column =
    org.apache.spark.sql.SparkSession.getActiveSession match {
      case Some(s) =>
        graft.functions.LshKernels.register(s)
        call_function("vec_nrm", a, lit(dim))
      case None => sqrt(dotN(a, a, dim))
    }

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Embedding dimensionality probed from the data (schemas don't carry
    * array lengths); one metadata-cheap first-row action. Callers that
    * know the dim (it's fixed per corpus — engine-conf/manifest material
    * at 100 TB) pass it via the `dim` parameter and skip the probe.
    */
  def dimOf(embeddings: DataFrame): Int =
    embeddings.select(size(col("embedding"))).head().getInt(0)

  /** Resolve (dim, bits) for a sign-LSH entry point: caller-supplied
    * stats win; otherwise probe the first row for dim and pay one corpus
    * count for bits. At 100 TB a count-per-top-k-query is a full-scan
    * action for a statistic that changes slowly (VERDICT r04 #2) — the
    * manifest's row count ([[Discover.manifest]]) or a cached figure
    * belongs in `corpusCount`; the count here is the cold-start fallback,
    * not the steady state.
    */
  private def resolveBits(embeddings: DataFrame, bits: Option[Int],
                          corpusCount: Option[Long], dim: Option[Int],
                          targetBucket: Long): (Int, Int) = {
    val d = dim.getOrElse(dimOf(embeddings))
    val b = math.min(d, bits.getOrElse(
      deriveBits(corpusCount.getOrElse(embeddings.count()), targetBucket)))
    (d, b)
  }

  /** Scale-derived sign-LSH bit count: the bit length of
    * (corpusCount - 1) / targetBucket, clamped to [1, 16] — i.e. the
    * smallest b whose 2^b buckets keep the expected bucket near
    * `targetBucket` rows, so co-bucket join work stays ~N*targetBucket
    * instead of growing (N/2^fixedBits)^2 (VERDICT r03 #7: a fixed 6
    * bits = 64 buckets goes quadratic past ~10^7 vectors). Integer-only
    * bit-length arithmetic on purpose: the DuckDB oracle mirrors it as
    * LENGTH(BIN((n-1) // target)) with no float-log parity risk. The
    * 16-bit clamp bounds the unrolled [[signBucket]] expression; past
    * 2^16 * targetBucket vectors, add independent hyperplane bands (as
    * [[Dedup.minhashNearDups]] does) rather than more bits.
    */
  def deriveBits(corpusCount: Long, targetBucket: Long = 1000L): Int = {
    val k = math.max(corpusCount - 1, 0L) / targetBucket
    math.min(16, math.max(1, 64 - java.lang.Long.numberOfLeadingZeros(k)))
  }

  /** True iff `df` has at most `cap` rows, decided by a bounded count
    * (limit cap+1 — never a full count of an unbounded relation). Guards
    * every query/probe-side broadcast: a broad queryPred must degrade to
    * a shuffled join, not a driver OOM (ADVICE r03).
    */
  private def fitsBroadcast(df: DataFrame, cap: Int): Boolean =
    df.limit(cap + 1).count() <= cap

  /** Sign-LSH bucket id: `bits` sign bits of the leading dimensions. */
  /** Sign-pattern bucket key over the first `bits` elements —
    * kernel-backed like [[normN]] (one node instead of `bits`
    * conditionals; a null cell contributes 0 AND a null array buckets
    * to 0L, exactly like the unrolled `when(...).otherwise(0)` —
    * both paths keep null-embedding rows in bucket 0 rather than
    * dropping them from every LSH equijoin; ADVICE r15, ParitySpec-
    * pinned).
    */
  def signBucket(e: Column, bits: Int): Column =
    org.apache.spark.sql.SparkSession.getActiveSession match {
      case Some(s) =>
        graft.functions.LshKernels.register(s)
        call_function("sign_bucket", e, lit(bits))
      case None =>
        (0 until bits).map { i =>
          when(element_at(e, i + 1) > 0f, lit(1L << i)).otherwise(lit(0L))
        }.reduce(_ + _)
    }

  /** [[signBucket]] of the `embedding` dimension slice
    * [off, off+bits) — band j of the banded lanes at off = j·bits.
    */
  private def signBucketAt(off: Int, bits: Int): Column =
    org.apache.spark.sql.SparkSession.getActiveSession match {
      case Some(s) =>
        graft.functions.LshKernels.register(s)
        call_function("sign_bucket", col("embedding"), lit(off), lit(bits))
      case None =>
        (0 until bits).map { i =>
          when(element_at(col("embedding"), off + i + 1) > 0f,
            lit(1L << i)).otherwise(lit(0L))
        }.reduce(_ + _)
    }

  /** (vec_id, embedding, nrm) side relation: the norm is computed ONCE
    * per row (narrow, codegen'd) so the per-pair work after a join is a
    * single dot product.
    */
  private def withNorm(embeddings: DataFrame, dim: Int): DataFrame =
    embeddings.select(col("vec_id"), col("embedding"),
      normN(col("embedding"), dim).as("nrm"))

  /** Score candidate-pair rows via the native codegen'd
    * [[graft.functions.CosineScore]] expression.
    *
    * Input columns: q_id, q_emb, q_nrm, c_id, c_emb, c_nrm — the
    * equi-join output. Output: (left_id, cand_id, score) with score =
    * round6(dot/(|q||c|)), optionally threshold-filtered.
    *
    * Why not a `round(dotN(...)/...)` projection: a 64-dim unrolled dot
    * is a ~500-node expression; placed after (or worse, pushed INTO the
    * condition of) the pair join it overflows whole-stage codegen and
    * Catalyst silently evaluates it interpreted, at ~40 us/pair instead
    * of ~0.1 us (ADVICE r03 — ann_lsh's r3 regression, reproduced on
    * embed_neardup_bucketed in r4 plan audits). cosine_score is ONE
    * expression node generating a tight primitive loop, so pair scoring
    * stays declarative AND inside WholeStageCodegen — SURVEY.md §7.3
    * ladder step (b), preferred over the mapPartitions kernel this
    * replaced (which paid an InternalRow->Row conversion per pair).
    * Same determinism contract as [[kernelScores]]: left-to-right
    * double fold + HALF_UP round6.
    */
  private def scorePairs(cand: DataFrame, minScore: Option[Double]): DataFrame = {
    graft.functions.CosineScore.register(cand.sparkSession)
    val scored = cand.select(
      col("q_id").as("left_id"), col("c_id").as("cand_id"),
      expr("cosine_score(q_emb, c_emb, q_nrm, c_nrm)").as("score"))
    minScore.fold(scored)(t => scored.filter(col("score") >= t))
  }

  // ------------------------------------------------ fused kernel internals

  /** Driver-memory guard for the brute-force broadcast (~(dim*8+32) bytes
    * per vector ⇒ ~half a GB at the default). The bucketed/IVF paths have
    * no such bound — use them past this size.
    */
  val MaxBroadcastVecs: Int = 1000000

  /** Exact replica of Spark's round(double, 6): BigDecimal.valueOf
    * (canonical Double.toString) + HALF_UP. Package-visible: the
    * residual-PQ trainer assigns its bounded sample to coarse cells on
    * the driver with the same rounding the engine uses.
    */
  private[operators] def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  private case class Vec(id: Long, v: Array[Double], norm: Double)

  private def toVec(row: org.apache.spark.sql.Row): Vec = {
    val d = row.getSeq[Float](1).toArray.map(_.toDouble)
    var n2 = 0d; var i = 0
    while (i < d.length) { n2 += d(i) * d(i); i += 1 }
    Vec(row.getLong(0), d, math.sqrt(n2))
  }

  /** Collect a BOUNDED vector set into primitive form — since r12 only
    * the COARSE QUANTIZER lanes use this (centroid seeds, nCentroids
    * rows by construction; the brute-force pair scoring streams the
    * corpus relationally instead). The cap is a hard error, not a
    * truncation.
    */
  private def collectVecs(embeddings: DataFrame, cap: Int): Array[Vec] = {
    val rows = embeddings.select(col("vec_id"), col("embedding"))
      .limit(cap + 1).collect()
    require(rows.length <= cap,
      s"bounded vector set exceeds $cap vectors; use signLshTopK/ivfTopK " +
        "(distributed candidate generation) at this scale")
    rows.map(toVec).sortBy(_.id)
  }

  /** Score every (stream row, corpus row) pair via the native
    * [[graft.functions.CosineAll]] kernel: the bounded `stream` side is
    * collected and broadcast (hard [[MaxBroadcastVecs]] error at
    * collect — the brute-force contract: error, never truncation), the
    * CORPUS streams, and each corpus row pays ONE static call scoring
    * it against every broadcast candidate inside WholeStageCodegen —
    * no join, no per-pair row assembly, no RDD hop. (History: the r11
    * `rdd.mapPartitions` lane collected the corpus and re-created a
    * DataFrame — an ExistingRDD barrier outside AQE; an interim r12
    * pmod-keyed broadcast-hash-join form was fully relational but paid
    * join-row assembly per pair plus guard/probe actions — measured
    * 2-3× on the gauges. This kernel keeps the join form's posture at
    * the JVM lane's speed.) `pairOriented` keeps only left < cand
    * (near-dup pairs); otherwise all non-self candidates (top-k
    * input). Scoring runs on corpus partitions — spread, so a
    * single-file fixture doesn't serialize the pass on one core.
    */
  private def kernelScores(stream: DataFrame, embeddings: DataFrame,
                           pairOriented: Boolean): DataFrame = {
    val spark = embeddings.sparkSession
    val bc = spark.sparkContext.broadcast(
      collectVecs(stream, MaxBroadcastVecs).map(v => (v.id, v.v, v.norm)))
    import org.apache.spark.sql.GraftColumns
    val scoresArr = GraftColumns.of(graft.functions.CosineAllExpr(
      GraftColumns.expressionOf(col("vec_id")),
      GraftColumns.expressionOf(col("embedding")), pairOriented, bc.id)(bc))
    graft.Tables.spread(embeddings)
      .select(col("vec_id").as("c_id"), explode(scoresArr).as("p"))
      .select(col("p.left_id").as("left_id"), col("c_id").as("cand_id"),
        col("p.score").as("score"))
  }

  /** Exact cosine top-k: for each query vector (query predicate selects a
    * small set), the k nearest other vectors. Rank on (rounded score desc,
    * candidate id asc).
    */
  def bruteForceTopK(embeddings: DataFrame, queryPred: Column, k: Int): DataFrame = {
    val q = embeddings.filter(queryPred) // broadcast side: no spread needed
    val scored = kernelScores(q, embeddings, pairOriented = false)
      .withColumnRenamed("left_id", "query_id")
    topK(scored, k)
  }

  /** Maximal-Marginal-Relevance diverse top-k (Carbonell & Goldstein
    * 1998): greedily pick the candidate maximizing
    * relevance − λ·max-sim-to-already-picked with λ = 1/2 — the
    * diverse-exemplar selector (few-shot example picking, dedup-aware
    * retrieval, eval-set construction) where a plain top-k returns k
    * near-copies of the same best hit.
    *
    * Exact-integer contract: relevance and each pair similarity are
    * round(cos, 6)·1e6 micro longs (the [[kernelScores]] kernel), the
    * λ-penalty is a sign-aware integer halving, ties break on the
    * lowest id — the oracle unrolls the k greedy rounds and matches
    * bit-for-bit. Each round is ONE corpus pass scoring against the
    * ≤k-vector broadcast picked set plus a 1-row bounded argmax collect
    * (the BPE top-pair contract); the relevance pass runs once and is
    * checkpointed.
    */
  def mmrSelect(embeddings: DataFrame, queryPred: Column,
                k: Int = 5): DataFrame = {
    require(k >= 1 && k <= 16, s"mmrSelect: k=$k outside [1,16]")
    val spark = embeddings.sparkSession
    import spark.implicits._
    val rel0 = kernelScores(embeddings.filter(queryPred), embeddings,
        pairOriented = false)
      .select(col("cand_id").as("vec_id"),
        round(col("score") * lit(1000000)).cast("long").as("rel_micro"))
      .localCheckpoint()
    val picks = Seq.newBuilder[(Int, Long, Long, Long)]
    var selIds = List.empty[Long]
    var r = 1
    while (r <= k) {
      val base = rel0.filter(!col("vec_id").isin(selIds: _*))
      val scored =
        if (selIds.isEmpty) base.withColumn("score_micro", col("rel_micro"))
        else {
          val sims = kernelScores(
              embeddings.filter(col("vec_id").isin(selIds: _*)), embeddings,
              pairOriented = false)
            .select(col("cand_id").as("vec_id"),
              round(col("score") * lit(1000000)).cast("long").as("sm"))
            .groupBy("vec_id").agg(max(col("sm")).as("ms"))
          base.join(sims, "vec_id")
            .withColumn("score_micro", col("rel_micro") -
              expr("case when ms < 0 then -((-ms) div 2) else ms div 2 end"))
        }
      val p = scored.orderBy(col("score_micro").desc, col("vec_id"))
        .select("vec_id", "rel_micro", "score_micro").limit(1).collect()(0)
      picks += ((r, p.getLong(0), p.getLong(1), p.getLong(2)))
      selIds = selIds :+ p.getLong(0)
      r += 1
    }
    picks.result().toDF("rank", "vec_id", "rel_micro", "score_micro")
  }

  /** Hard-negative mining for retrieval/embedding training: per query,
    * the k nearest neighbors whose LABEL DIFFERS — the most-confusable
    * wrong answers, which is exactly the contrastive-training batch a
    * dual-encoder wants (random negatives are too easy to teach margin).
    *
    * Same exact-scoring contract as [[bruteForceTopK]] (`queryPred`
    * selects a small query set; the corpus streams through the scoring
    * join). The candidate-side label attach broadcasts the 2-column
    * (id, label) relation — ~dim×8 smaller than the vectors, and the
    * alternative (shuffling the Q×N scored relation on cand_id) is
    * strictly worse; at the scale where even that broadcast hurts, the
    * brute-force face is out of contract anyway.
    * Ranking happens AFTER the label filter — a same-label neighbor
    * never shadows a harder negative.
    */
  def hardNegatives(embeddings: DataFrame, queryPred: Column,
                    k: Int): DataFrame = {
    val q = embeddings.filter(queryPred) // broadcast side: no spread needed
    val scored = kernelScores(q, embeddings, pairOriented = false)
      .withColumnRenamed("left_id", "query_id")
    val labels = embeddings.select(col("vec_id"), col("label"))
    val labeled = scored
      .join(broadcast(labels.select(col("vec_id").as("query_id"),
        col("label").as("q_label"))), "query_id")
      .join(broadcast(labels.select(col("vec_id").as("cand_id"),
        col("label").as("c_label"))), "cand_id")
      .filter(col("q_label") =!= col("c_label"))
    topK(labeled, k)
      .select(col("query_id"), col("q_label"), col("cand_id"),
        col("c_label"), col("score"), col("rank"))
  }

  /** Bucketed ANN top-k: candidates share the query's sign bucket.
    *
    * Fully distributed: bucket ids are computed on BOTH sides as narrow
    * projections and pairing is a bucket equi-join. The query side (small
    * by the queryPred contract) is broadcast, so the corpus side streams
    * through a BroadcastHashJoin — no shuffle of the corpus, no driver
    * collect, and the scoring projection is whole-stage codegen'd.
    */
  def signLshTopK(embeddings: DataFrame, queryPred: Column, k: Int,
                  bits: Option[Int] = None, corpusCount: Option[Long] = None,
                  dim: Option[Int] = None): DataFrame = {
    val (d, b) = resolveBits(embeddings, bits, corpusCount, dim, 1000L)
    signLshTopKOn(embeddings, col("embedding"), d, queryPred, k,
      Some(b), Some(d), repIsExpensive = false)
  }

  /** [[signLshTopK]] with the BUCKETS computed on an alternate per-row
    * representation of the vector (`indexRep`, an array column over the
    * same relation — e.g. [[Pca.jlProjectCol]]'s 16-dim reduction) while
    * candidate SCORING stays on the full-precision embedding. This is
    * the reduce-then-index composition a real embed store runs: the
    * index stores/hashes the cheap representation (4× smaller at k=16),
    * the rerank spends full dimensions only on co-bucket candidates.
    * `indexRep` must be a deterministic per-row projection — it is
    * evaluated inside the same scan as the norm (NO join, NO second
    * pass), so the composition adds zero shuffles over [[signLshTopK]].
    * `repDim` clamps the bucket bits to the representation's width.
    */
  def signLshTopKOn(embeddings: DataFrame, indexRep: Column, repDim: Int,
                    queryPred: Column, k: Int,
                    bits: Option[Int] = None,
                    dim: Option[Int] = None,
                    repIsExpensive: Boolean = true): DataFrame = {
    val d = dim.getOrElse(dimOf(embeddings))
    val b = math.min(repDim,
      bits.getOrElse(deriveBits(embeddings.count(), 1000L)))
    // signBucket references its input once per BIT; for a plain column
    // that's a cheap attribute read, but an EXPENSIVE rep (the JL
    // kernel) must bind once per row — ride it as a generator child
    // (explode of a 1-element array, the jl_parts pattern) so
    // CollapseProject can't inline b copies of the kernel into the
    // bucket projection on a codegen-fallback path. The caller states
    // which case it is via `repIsExpensive` (both paths are
    // row-identical; the flag only picks the cheaper plan) — an
    // explicit contract instead of sniffing Column.toString, whose
    // rendering can shift across Spark versions (ADVICE r14). The
    // default is the SAFE side: let-binding a cheap rep costs one
    // no-op generator; inlining an expensive one costs b kernel
    // evaluations per row.
    def side(df: DataFrame, p: String): DataFrame = {
      val base = withNorm(df, d)
      if (!repIsExpensive)
        base.select(
          col("vec_id").as(s"${p}_id"), col("embedding").as(s"${p}_emb"),
          col("nrm").as(s"${p}_nrm"), signBucket(indexRep, b).as(s"${p}_bucket"))
      else
        base.select(col("vec_id"), col("embedding"), col("nrm"),
            explode(array(indexRep)).as("rep"))
          .select(
            col("vec_id").as(s"${p}_id"), col("embedding").as(s"${p}_emb"),
            col("nrm").as(s"${p}_nrm"),
            signBucket(col("rep"), b).as(s"${p}_bucket"))
    }
    val qBase = embeddings.filter(queryPred)
    val q = side(qBase, "q")
    val c = side(embeddings, "c")
    // queryPred is small by contract, but the contract is guarded: a
    // broad predicate drops the hint and Catalyst plans a shuffled
    // bucket join instead of broadcasting the corpus (ADVICE r03)
    val qRel = if (fitsBroadcast(qBase, MaxBroadcastVecs)) broadcast(q) else q
    val cand = c.join(qRel,
        col("q_bucket") === col("c_bucket") && col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("q_emb"), col("q_nrm"),
        col("c_id"), col("c_emb"), col("c_nrm"))
    val scored = scorePairs(cand, None).withColumnRenamed("left_id", "query_id")
    topK(scored, k)
  }

  /** Multi-band sign-LSH top-k — the recall recovery over
    * [[signLshTopK]], same banding as [[nearDupPairsBanded]]: a
    * candidate shares ANY of `bands` dim-slice sign bands with the
    * query. Candidate generation joins narrow (id, band_id, key)
    * relations (query side broadcast under the usual guard), pairs
    * dedupe BEFORE embeddings are attached for scoring.
    */
  def signLshTopKBanded(embeddings: DataFrame, queryPred: Column, k: Int,
                        bands: Int = 4, bits: Option[Int] = None,
                        corpusCount: Option[Long] = None,
                        dim: Option[Int] = None): DataFrame = {
    val (d, b) = resolveBits(embeddings, bits, corpusCount, dim, 1000L)
    val nb = math.max(1, math.min(bands, d / b))
    def bandKey(j: Int): Column = signBucketAt(j * b, b)
    def bandRel(df: DataFrame, p: String): DataFrame =
      df.select(col("vec_id").as(s"${p}_id"),
        explode(array((0 until nb).map(j =>
          struct(lit(j).as("band_id"), bandKey(j).as("bkey"))): _*)).as("band"))
        .select(col(s"${p}_id"), col("band.band_id"), col("band.bkey"))
    val qBase = embeddings.filter(queryPred)
    val q = bandRel(qBase, "q")
    val qRel = if (fitsBroadcast(qBase, MaxBroadcastVecs)) broadcast(q) else q
    val cand = bandRel(embeddings, "c").join(qRel, Seq("band_id", "bkey"))
      .filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id")).distinct()
    val side = withNorm(embeddings, d)
    val pairs = cand
      .join(side.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm")), Seq("q_id"))
      .join(side.select(col("vec_id").as("c_id"), col("embedding").as("c_emb"),
        col("nrm").as("c_nrm")), Seq("c_id"))
      .select(col("q_id"), col("q_emb"), col("q_nrm"),
        col("c_id"), col("c_emb"), col("c_nrm"))
    topK(scorePairs(pairs, None).withColumnRenamed("left_id", "query_id"), k)
  }

  /** Sign-LSH near-duplicate pair mining — the 100 TB analogue of
    * [[nearDupPairs]] and the embedding twin of
    * [[Dedup.minhashNearDups]]: candidate pairs come from a co-bucket
    * self equi-join (both sides shuffle-partition on the bucket id; no
    * broadcast — both sides are the corpus), then the exact rounded
    * cosine verifies candidates only. Recall loss is pairs whose sign
    * patterns differ (mirrors the LSH trade the minhash path makes);
    * precision is exact.
    */
  /** Pair mining pays ~bucketSize^2 per bucket (BOTH sides are the
    * corpus), unlike top-k's queries x bucketSize, so its derived
    * buckets target ~250 rows instead of [[deriveBits]]'s 1000 — total
    * candidate work ~N*250 with 4x less quadratic headroom per bucket.
    */
  val PairMiningTargetBucket: Long = 250L

  def nearDupPairsBucketed(embeddings: DataFrame, threshold: Double,
                           bits: Option[Int] = None,
                           corpusCount: Option[Long] = None,
                           dim: Option[Int] = None): DataFrame = {
    val (d, b) =
      resolveBits(embeddings, bits, corpusCount, dim, PairMiningTargetBucket)
    def side(p: String): DataFrame =
      withNorm(embeddings, d).select(
        col("vec_id").as(s"${p}_id"), col("embedding").as(s"${p}_emb"),
        col("nrm").as(s"${p}_nrm"), signBucket(col("embedding"), b).as(s"${p}_bucket"))
    val cand = side("q").join(side("c"),
        col("q_bucket") === col("c_bucket") && col("q_id") < col("c_id"))
      .select(col("q_id"), col("q_emb"), col("q_nrm"),
        col("c_id"), col("c_emb"), col("c_nrm"))
    scorePairs(cand, Some(threshold))
      .withColumnRenamed("left_id", "id_a")
      .withColumnRenamed("cand_id", "id_b")
  }

  /** Multi-band sign-LSH near-duplicate pair mining — the recall
    * recovery over [[nearDupPairsBucketed]] (VERDICT r03 #7's "multiple
    * independent bands" alternative, mirroring
    * [[Dedup.minhashNearDups]]'s band structure): band j buckets on the
    * sign bits of dimension slice [j*bits, (j+1)*bits), candidates agree
    * on ANY band (union via an equi-join on (band_id, key) over the
    * exploded narrow band relation — embeddings never ride the explode),
    * exact rounded cosine verifies candidate pairs only. A pair is
    * missed only if EVERY band's sign slice differs — recall approaches
    * exact at bands x the bucketed variant's candidate cost.
    */
  def nearDupPairsBanded(embeddings: DataFrame, threshold: Double,
                         bands: Int = 4, bits: Option[Int] = None,
                         corpusCount: Option[Long] = None,
                         dim: Option[Int] = None): DataFrame = {
    val (d, b) =
      resolveBits(embeddings, bits, corpusCount, dim, PairMiningTargetBucket)
    val nb = math.max(1, math.min(bands, d / b))
    def bandKey(j: Int): Column = signBucketAt(j * b, b)
    val bandRel = embeddings.select(col("vec_id"),
      explode(array((0 until nb).map(j =>
        struct(lit(j).as("band_id"), bandKey(j).as("bkey"))): _*)).as("band"))
      .select(col("vec_id"), col("band.band_id"), col("band.bkey"))
    val cand = bandRel.as("a").join(bandRel.as("b"), Seq("band_id", "bkey"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"))
      .filter(col("id_a") < col("id_b"))
      .distinct()
    val side = withNorm(embeddings, d)
    val pairs = cand
      .join(side.select(col("vec_id").as("id_a"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm")), Seq("id_a"))
      .join(side.select(col("vec_id").as("id_b"), col("embedding").as("c_emb"),
        col("nrm").as("c_nrm")), Seq("id_b"))
      .select(col("id_a").as("q_id"), col("q_emb"), col("q_nrm"),
        col("id_b").as("c_id"), col("c_emb"), col("c_nrm"))
    scorePairs(pairs, Some(threshold))
      .withColumnRenamed("left_id", "id_a")
      .withColumnRenamed("cand_id", "id_b")
  }

  /** IVF (inverted-file) ANN top-k — the classic coarse-quantizer scale
    * path next to [[signLshTopK]]: a deterministic centroid set (the
    * hash-sampled [[centroidSeed]] — a seeded k-means would iterate from
    * it; determinism is the engine contract, SURVEY.md §4), every vector
    * assigned to its nearest centroid (the inverted lists), and each
    * query probing only the `nProbe` nearest lists. Per-query work drops
    * from N to nProbe x listSize.
    *
    * Distribution: ONLY the centroid array is collected/broadcast (its
    * size is nCentroids by construction — the coarse quantizer is small
    * or it isn't coarse). Assignment and probe selection are one narrow
    * kernel pass each against the broadcast centroids; probe×list
    * pairing is an equi-join on the centroid id with the (small) probe
    * side broadcast, so the corpus-sized list relation streams. At
    * 100 TB the assigned relation would persist as a table bucketed by
    * `cid` so repeated queries skip the assignment pass.
    *
    * Assignment/probe ordering uses UNROUNDED cosine with centroid-id
    * tie-break; only emitted scores are rounded — the oracle mirrors both
    * orderings exactly.
    */
  def ivfTopK(embeddings: DataFrame, queryPred: Column, k: Int,
              nCentroids: Int = 16, nProbe: Int = 2): DataFrame =
    ivfTopKFrom(ivfIndex(embeddings, nCentroids), embeddings, queryPred, k,
      nCentroids, nProbe)

  /** One narrow distributed pass: each row -> its `take` nearest centroid
    * ids (unrounded cosine, centroid-id tie-break), norm computed en
    * route so the pair join needs only a dot product.
    */
  /** Deterministic hash-sampled coarse quantizer: the `nCentroids` rows
    * with the lowest md5(vec_id) (vec_id tie-break). Equivalent to a
    * seeded uniform sample — md5 scrambles any correlation between id
    * order and embedding space, so clustered corpora (where the lowest
    * ids would all sit in one cluster and leave every other inverted
    * list boundary-assigned and unbalanced — VERDICT r04 missing #3) get
    * spread centroids. A distributed top-n (TakeOrderedAndProject), never
    * a full sort; oracle-mirrored as ORDER BY md5(CAST(vec_id AS
    * VARCHAR)) LIMIT n. A k-means refinement would iterate from exactly
    * this seed.
    */
  private def centroidSeed(embeddings: DataFrame, nCentroids: Int): DataFrame =
    embeddings
      .select(col("vec_id"), col("embedding"),
        md5(col("vec_id").cast("string").cast("binary")).as("h"))
      .orderBy(col("h"), col("vec_id"))
      .limit(nCentroids)
      .select(col("vec_id"), col("embedding"))

  private def ivfAssign(embeddings: DataFrame, df: DataFrame,
                        nCentroids: Int, take: Int, p: String): DataFrame =
    ivfAssignTo(collectVecs(centroidSeed(embeddings, nCentroids), nCentroids),
      df, take, p)

  /** Assign each row of `df` to its `take` nearest EXPLICIT centroids —
    * the kernel [[ivfAssign]] and the k-means-refined path share. Since
    * r12 this is the native codegen'd `ivf_assign` expression
    * ([[graft.functions.IvfKernels]] — centroid matrix as foldable
    * literals, one static-call loop per row inside WholeStageCodegen),
    * replacing the r11 `rdd.mapPartitions` lane whose per-row Row
    * construction + DataFrame re-create forced eager planning outside
    * AQE (VERDICT r11 #1). Same (score DESC, cid ASC) total order, same
    * left-to-right folds — bit-identical output.
    *
    * Plan shape: the (nrm, cids[]) struct array rides ONE kernel call
    * per row as the posexplode generator child; nrm and cid are struct
    * fields of the generator OUTPUT, so no downstream-inferred
    * IsNotNull can be rewritten below the Generate and re-evaluate the
    * kernel (the r11 ccid pitfall), and the kernel never runs twice.
    */
  private def ivfAssignTo(cents: Array[Vec], df: DataFrame,
                          take: Int, p: String): DataFrame = {
    graft.functions.IvfKernels.register(df.sparkSession)
    val cvsL = typedLit(cents.map(_.v.toSeq).toSeq)
    val cidsL = typedLit(cents.map(_.id).toSeq)
    val cnrmsL = typedLit(cents.map(_.norm).toSeq)
    df.filter(col("embedding").isNotNull)
      .select(col("vec_id").as(s"${p}_id"), col("embedding").as(s"${p}_emb"),
        call_function("ivf_assign", col("embedding"),
          lit(take), cvsL, cidsL, cnrmsL).as("__a"))
      .select(col(s"${p}_id"), col(s"${p}_emb"),
        col("__a.nrm").as(s"${p}_nrm"),
        explode(col("__a.cids")).as("cid"))
  }

  /** The IVF inverted-list relation (c_id, c_emb, c_nrm, cid): every
    * vector assigned to its nearest centroid. The index-reuse surface
    * (same contract as [[Dedup.minhashNearDupsFrom]]'s signature input):
    * at 100 TB a caller materializes this ONCE — persisted or written as
    * a table bucketed by `cid` — and serves every subsequent query
    * through [[ivfTopKFrom]], skipping the assignment pass.
    */
  def ivfIndex(embeddings: DataFrame, nCentroids: Int = 16): DataFrame =
    ivfAssign(embeddings, embeddings, nCentroids, 1, "c")

  /** [[ivfTopK]] over an existing [[ivfIndex]] relation. */
  def ivfTopKFrom(lists: DataFrame, embeddings: DataFrame, queryPred: Column,
                  k: Int, nCentroids: Int = 16, nProbe: Int = 2): DataFrame = {
    val probeBase = graft.Tables.spread(embeddings).filter(queryPred)
    val probes = ivfAssign(embeddings, probeBase, nCentroids, nProbe, "q")
    // same guard as signLshTopK: a broad queryPred must not broadcast
    // the corpus-with-embeddings to every executor (ADVICE r03)
    val probeRel =
      if (fitsBroadcast(probeBase, MaxBroadcastVecs)) broadcast(probes)
      else probes
    val cand = lists.join(probeRel, Seq("cid"))
      .filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("q_emb"), col("q_nrm"),
        col("c_id"), col("c_emb"), col("c_nrm"))
    val scored = scorePairs(cand, None).withColumnRenamed("left_id", "query_id")
    topK(scored, k)
  }

  /** One-Lloyd-iteration refined centroids (cid, cv: array<double>): each
    * vector assigns to its nearest seed centroid ([[centroidSeed]]), and
    * the refined centroid is the member mean per dimension. Component
    * sums go through DECIMAL(27,10) — exact and ORDER-INDEPENDENT, so the
    * mean is deterministic under any partitioning (a double sum would
    * drift with aggregation order) and the DuckDB oracle reproduces it
    * bit-for-bit; the only float step, the final sum/count division, has
    * both operands identical in both engines. Narrow posture: the
    * posexplode emits (cid, pos, v) triples — dim rows per vector, no
    * document-sized state — and the per-cid reassembly list is
    * dim-bounded. Further Lloyd iterations would loop this relation
    * through [[ivfAssignTo]]; one iteration already repairs the seed's
    * worst imbalance, the standard IVF training trade.
    */
  def refinedCentroids(embeddings: DataFrame, nCentroids: Int = 16): DataFrame = {
    val members = ivfIndex(embeddings, nCentroids)
      .select(col("cid"), posexplode(col("c_emb")))
      .toDF("cid", "pos", "v")
    val comp = members.groupBy("cid", "pos")
      .agg((sum(col("v").cast("double").cast("decimal(27,10)")).cast("double") /
        count(lit(1))).as("c"))
    comp.groupBy("cid")
      .agg(sort_array(collect_list(struct(col("pos"), col("c")))).as("pc"))
      .select(col("cid"), expr("transform(pc, x -> x.c)").as("cv"))
  }

  /** Multi-round spherical k-means (Lloyd) TRAINING CURVE — the full
    * quantizer-training loop behind [[ivfTopKKmeans]]'s single step,
    * exposed as a relation: per round and per cluster, the member count
    * and the cohesion Σ round(cos(x, centroid), 6)·1e6 (exact long —
    * the spherical-k-means objective in micro units). Spherical Lloyd
    * (Dhillon & Modha 2001) is the cosine-space standard; assignment
    * maximizes cosine (the same codegen'd `ivf_assign` kernel and
    * (score DESC, cid ASC) order as every IVF face) and the update is
    * the member MEAN with DECIMAL(27,10)-exact component sums, so every
    * round is bit-reproducible and the oracle unrolls the whole loop.
    *
    * Scale posture: each round is ONE corpus pass against broadcast
    * literal centroids plus a census-sized aggregation; the only driver
    * state is the nCentroids×dim codebook (the training loop IS
    * codebook training). Clusters that lose all members die (their cid
    * simply stops appearing) — the standard small-k hazard, visible in
    * the curve rather than papered over.
    */
  def kmeansTrainCurve(embeddings: DataFrame, nCentroids: Int = 16,
                       rounds: Int = 3): DataFrame = {
    require(rounds >= 1 && rounds <= 8, s"kmeansTrainCurve: rounds=$rounds")
    val spark = embeddings.sparkSession
    import spark.implicits._
    var cents = collectVecs(centroidSeed(embeddings, nCentroids), nCentroids)
    val perRound = Seq.newBuilder[DataFrame]
    var r = 1
    while (r <= rounds) {
      val assigned = ivfAssignTo(cents, embeddings, 1, "c")
      val centsDf = broadcast(cents.toSeq
        .map(c => (c.id, c.v.toSeq, c.norm)).toDF("cid", "cv", "cnrm"))
      val scored = assigned.join(centsDf, "cid")
        .withColumn("score", round(
          expr("aggregate(zip_with(c_emb, cv, (a, b) -> cast(a as double) * b)," +
            " cast(0 as double), (acc, p) -> acc + p)") /
            (col("c_nrm") * col("cnrm")), 6))
        .withColumn("micro",
          round(col("score") * lit(1000000)).cast("long"))
      perRound += scored.groupBy("cid")
        .agg(count(lit(1)).as("n_members"), sum(col("micro")).as("cohesion_micro"))
        .withColumn("round", lit(r))
        .select("round", "cid", "n_members", "cohesion_micro")
      if (r < rounds) {
        val comp = assigned
          .select(col("cid"), posexplode(col("c_emb"))).toDF("cid", "pos", "v")
          .groupBy("cid", "pos")
          .agg((sum(col("v").cast("double").cast("decimal(27,10)")).cast("double") /
            count(lit(1))).as("c"))
        cents = comp.groupBy("cid")
          .agg(sort_array(collect_list(struct(col("pos"), col("c")))).as("pc"))
          .select(col("cid"), expr("transform(pc, x -> x.c)").as("cv"))
          .collect()
          .map { row =>
            val v = row.getSeq[Double](1).toArray
            var n2 = 0d; var i = 0
            while (i < v.length) { n2 += v(i) * v(i); i += 1 }
            Vec(row.getLong(0), v, math.sqrt(n2))
          }.sortBy(_.id)
      }
      r += 1
    }
    perRound.result().reduce(_ unionByName _).orderBy("round", "cid")
  }

  /** [[refinedCentroids]] collected into the driver-side Vec array the
    * assignment kernel consumes — nCentroids rows by construction, the
    * same bounded-collect contract as every quantizer in this repo.
    */
  private def refinedVecs(embeddings: DataFrame,
                          nCentroids: Int): Array[Vec] =
    refinedCentroids(embeddings, nCentroids).collect()
      .map { r =>
        val v = r.getSeq[Double](1).toArray
        var n2 = 0d; var i = 0
        while (i < v.length) { n2 += v(i) * v(i); i += 1 }
        Vec(r.getLong(0), v, math.sqrt(n2))
      }.sortBy(_.id)

  /** The one-Lloyd-round k-means coarse quantizer BOTH as driver state
    * (the L2-NORMALIZED centroid book a store's `_quantizers` sidecar
    * persists — the IVFADC coarse-book convention, so a probe's
    * norm-divided dot ranks by the same cosine the assignment
    * maximized) and as the corpus assignment relation (vec_id, ccid) —
    * trained ONCE, consumed twice. Index MAINTENANCE needs both
    * without the probe: [[graft.operators.ProductQuant.retrainStore]]
    * re-lists a collapsed store under the assignment and publishes the
    * book with the generation (the remedy for a hot list past the salt
    * clamp). One corpus scan against the broadcast-literal centroids;
    * ccid is the refined centroid's id (a seed vec_id), round6-cosine
    * argmax with centroid-id tie-break — the exact rule every IVF face
    * oracles. A degenerate zero-norm centroid (possible only when a
    * cluster's member mean is exactly 0⃗) keeps its raw components
    * rather than dividing by zero.
    */
  def kmeansQuantizer(embeddings: DataFrame, nCentroids: Int = 16)
      : (Seq[(Long, Array[Double])], DataFrame) = {
    val cents = refinedVecs(embeddings, nCentroids)
    val book = cents.toSeq.map(c =>
      (c.id, if (c.norm > 0) c.v.map(_ / c.norm) else c.v))
    (book, ivfAssignTo(cents, embeddings, 1, "c")
      .select(col("c_id").as("vec_id"), col("cid").as("ccid")))
  }

  /** [[kmeansQuantizer]]'s assignment half alone. */
  def kmeansAssign(embeddings: DataFrame, nCentroids: Int = 16): DataFrame =
    kmeansQuantizer(embeddings, nCentroids)._2

  /** [[ivfTopK]] with the one-iteration k-means quantizer: lists and
    * probes assign against [[refinedCentroids]] (collected/broadcast —
    * nCentroids rows by construction); pair scoring stays on the original
    * embeddings. Refined centroids track the data's actual density, so
    * inverted lists balance where the raw seed's nearest-member geometry
    * was lopsided.
    */
  def ivfTopKKmeans(embeddings: DataFrame, queryPred: Column, k: Int,
                    nCentroids: Int = 16, nProbe: Int = 2): DataFrame = {
    val cents = refinedVecs(embeddings, nCentroids)
    val lists = ivfAssignTo(cents, embeddings, 1, "c")
    val probeBase = graft.Tables.spread(embeddings).filter(queryPred)
    val probes = ivfAssignTo(cents, probeBase, nProbe, "q")
    val probeRel =
      if (fitsBroadcast(probeBase, MaxBroadcastVecs)) broadcast(probes)
      else probes
    val cand = lists.join(probeRel, Seq("cid"))
      .filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("q_emb"), col("q_nrm"),
        col("c_id"), col("c_emb"), col("c_nrm"))
    val scored = scorePairs(cand, None).withColumnRenamed("left_id", "query_id")
    topK(scored, k)
  }

  /** Exact cosine near-duplicate pairs (id-oriented, thresholded) — the
    * embedding-space analogue of [[Dedup.jaccardNearDups]]. Brute force
    * (guarded broadcast); [[nearDupPairsBucketed]] is the scale path.
    */
  def nearDupPairs(embeddings: DataFrame, threshold: Double): DataFrame =
    kernelScores(embeddings, embeddings, pairOriented = true)
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

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023,
    * arXiv:2303.09540): cluster with the coarse quantizer, compare pairs
    * only WITHIN each cluster, and drop the higher id of every pair at
    * cosine >= `threshold`. The clustering bounds pair work to
    * sum(|cluster|^2) instead of N^2 — the same candidate-bounding move
    * as [[nearDupPairsBucketed]], but with the quantizer's data-adaptive
    * cells instead of fixed sign planes, and a keep/drop VERDICT per
    * vector instead of a pair list (this is the curation face: its
    * `dropped=false` rows are the corpus that survives).
    *
    * Per vector: its cluster, how many lower-id in-cluster duplicates it
    * has (`n_dups` — the pairs that vote to drop it), and the verdict.
    * Cluster self-join shuffles on `cid`; the exact rounded cosine runs
    * on candidate pairs only via the codegen'd scorer.
    */
  def semdedup(embeddings: DataFrame, threshold: Double,
               nCentroids: Int = 16): DataFrame = {
    val idx = ivfIndex(embeddings, nCentroids)
    val votes = scorePairs(clusterPairs(idx), Some(threshold))
      .groupBy(col("cand_id").as("vec_id"))
      .agg(count(lit(1)).as("n_dups"))
    idx.select(col("c_id").as("vec_id"), col("cid"))
      .join(votes, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cid"),
        coalesce(col("n_dups"), lit(0L)).as("n_dups"),
        col("n_dups").isNotNull.as("dropped"))
  }

  /** Within-cluster candidate pairs of an [[ivfIndex]] relation (the
    * SemDeDup pair bound) — shared by [[semdedup]] and
    * [[semdedupSweep]] so the sweep measures exactly the pairs the
    * face scores.
    */
  private def clusterPairs(idx: DataFrame): DataFrame = {
    def side(p: String): DataFrame = idx.select(
      col("cid"), col("c_id").as(s"${p}_id"), col("c_emb").as(s"${p}_emb"),
      col("c_nrm").as(s"${p}_nrm"))
    side("q").join(side("c").withColumnRenamed("cid", "cid2"),
        col("cid") === col("cid2") && col("q_id") < col("c_id"))
      .select(col("q_id"), col("q_emb"), col("q_nrm"),
        col("c_id"), col("c_emb"), col("c_nrm"))
  }

  /** SemDeDup threshold OPERATING-POINT sweep — the dedup-rate curve
    * the 0.4 default hides: for each cosine threshold (milli), how
    * many within-cluster pairs clear it, how many vectors would drop
    * (max incoming pair score ≥ t), and how many survive. ONE pair
    * scoring pass (the same [[clusterPairs]] relation the face
    * scores); the sweep itself runs off two BOUNDED histograms — pair
    * scores and per-vector maxima, both bucketed at milli resolution —
    * joined to the threshold list via the pmod-one key, so no
    * corpus-sized relation is touched more than once. The
    * `minhash_band_sweep` / `ivfadc_probe_sweep` pattern applied to
    * the curation face.
    */
  def semdedupSweep(embeddings: DataFrame,
                    thresholdsMilli: Seq[Long] = Seq(300L, 400L, 500L, 600L, 700L),
                    nCentroids: Int = 16): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val scored = scorePairs(clusterPairs(ivfIndex(embeddings, nCentroids)), None)
      .withColumn("micro", round(col("score") * lit(1000000)).cast("long"))
      // milli bucket with FLOOR semantics for negatives: micro >= t*1000
      // iff bucket >= t (thresholds are whole millis)
      .withColumn("b", expr("cast(floor(micro / 1000.0) as bigint)"))
    val pairHist = scored.groupBy("b").agg(count(lit(1)).as("np"))
      .withColumn("__one", pmod(col("b"), lit(1L)))
    val maxHist = scored.groupBy("cand_id").agg(max(col("b")).as("b"))
      .groupBy("b").agg(count(lit(1)).as("nd"))
      .withColumn("__one", pmod(col("b"), lit(1L)))
    val nv = embeddings.agg(count(lit(1)).as("n_vectors"))
      .withColumn("__one", pmod(col("n_vectors"), lit(1L)))
    val thr = thresholdsMilli.toDF("threshold_milli")
      .withColumn("__one", pmod(col("threshold_milli"), lit(1L)))
    val pairs = thr.join(pairHist, Seq("__one"), "left")
      .groupBy("threshold_milli", "__one")
      .agg(sum(when(col("b") >= col("threshold_milli"), col("np"))
        .otherwise(0L)).as("n_pairs"))
    val drops = thr.join(maxHist, Seq("__one"), "left")
      .groupBy("threshold_milli", "__one")
      .agg(sum(when(col("b") >= col("threshold_milli"), col("nd"))
        .otherwise(0L)).as("n_dropped"))
    pairs.join(drops, Seq("threshold_milli", "__one"))
      .join(broadcast(nv), "__one").drop("__one")
      .select(col("threshold_milli"), col("n_vectors"), col("n_pairs"),
        col("n_dropped"),
        (col("n_vectors") - col("n_dropped")).as("n_survivors"))
      .orderBy("threshold_milli")
  }
}
