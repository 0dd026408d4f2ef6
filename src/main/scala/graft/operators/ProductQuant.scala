package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (PQ) — the third ANN scale path next to sign-LSH
  * ([[Similarity.signLshTopK]]) and IVF ([[Similarity.ivfTopK]]), and the
  * one that changes the MEMORY story: the embedding splits into `M`
  * subspaces, each subspace gets its own small codebook (`Ks` centroids,
  * one Lloyd refinement — same training shape as
  * [[Similarity.refinedCentroids]], per subspace), and every vector
  * compresses to M one-byte codes. At 100 TB that is the difference
  * between "the index needs the fleet's RAM" (64 floats = 256 B/vector)
  * and "the index rides along" (4 B/vector + a 32-row codebook) — PQ is
  * how billion-vector indexes fit at all (Jégou et al., "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011).
  *
  * Candidate generation here is CODE-MATCH banding: a candidate is
  * interesting when it shares ≥ `minMatch` of the query's M codes — an
  * integer-exact analogue of LSH banding over the learned codebook
  * (vectors quantizing identically in half their subspaces are close the
  * way same-band LSH keys are). Matching is a narrow (sub, code)
  * equi-join on the compressed code relation — corpus embeddings never
  * shuffle — and the survivors get the EXACT rounded cosine from the
  * codegen'd kernel, so lossy compression can only lose recall, never
  * corrupt a score. Classic ADC — summing per-subspace query-to-centroid
  * dots — naively re-accumulates floats across subspaces (a cross-engine
  * parity hazard); [[adcTopK]] provides it anyway by fixing each subspace
  * dot to integer micro-units before the sum, making the accumulation
  * exact and order-free.
  *
  * Distribution: ONLY the codebook is collected (M*Ks rows by
  * construction — same bounded-collect contract as the IVF centroid
  * array), and assignment/encoding unrolls it into a literal codegen
  * PROJECTION — no join, no extra exchange; the training pass is one
  * posexplode + decimal-mean aggregation per subspace.
  *
  * Determinism contract (same as the IVF family): codebook seeds are
  * md5-ordered, assignment ranks by ROUND6 subspace dot with centroid-id
  * tie-break (as a max over (sd, -cid) structs — identical total order),
  * refinement means go through DECIMAL(27,10) — every step
  * order-independent and oracle-mirrored bit for bit.
  */
object ProductQuant {

  /** Subspace count — codes per vector. */
  val M = 4

  /** Centroids per subspace codebook (one byte of code space is 256;
    * 8 keeps the fixture's posting lists non-degenerate).
    */
  val Ks = 8

  /** Codebook training-sample bound: the member means are learned from
    * the md5-ordered top `SampleN` vectors, not the full corpus — at
    * 100 TB codebook training is a bounded SAMPLE job (O(10·Ks)
    * representatives per centroid suffice for Lloyd means), while
    * ENCODING necessarily remains a full-corpus projection. The sample
    * is a deterministic md5-order prefix so the oracle mirrors it as a
    * plain ORDER BY ... LIMIT.
    */
  val SampleN = 10 * Ks

  /** ADC-lane codebook geometry: the two-stage shortlist+rerank face
    * ([[adcTopK]]) needs a finer book than the code-match bander (code
    * RECONSTRUCTION must rank, not just collide) — 8 subspaces × 16
    * centroids, trained on the same 10·Ks-per-book sample rule.
    */
  val AdcM = 8
  val AdcKs = 16
  val AdcSampleN = 10 * AdcKs

  /** ADC shortlist width: candidates surviving the code-only scan into
    * the exact rerank. 150 of the fixture's ~3k vectors ≈ 5%; at scale
    * this is the knob trading rerank I/O for recall (measured 0.90 at
    * sf0.01 by `adc_recall`).
    */
  val AdcShortlist = 150

  /** md5-ordered deterministic training sample; the seed vectors are its
    * first `ks` rows (mirror of Similarity.centroidSeed's ordering —
    * duplicated because that one is private and this codebook seeds
    * every subspace from the same full vectors).
    */
  private def sample(embeddings: DataFrame, sampleN: Int): DataFrame =
    embeddings
      .select(col("vec_id"), col("embedding"),
        md5(col("vec_id").cast("string").cast("binary")).as("h"))
      .orderBy(col("h"), col("vec_id"))
      .limit(sampleN)
      .select(col("vec_id"), col("embedding"))

  /** Per-centroid (sd, -cid) score structs: a left-fold dot of
    * `emb[off+1..off+n]` against each centroid's literal values (same
    * fold order as [[Similarity.dotN]]), round6'd. Ascending struct
    * order on (sd, ncid) is exactly the (sd ASC, cid DESC) total order,
    * so max = argmax by (sd DESC, cid ASC).
    */
  private def scoreStructs(emb: Column, cents: Seq[(Long, Array[Double])],
                           off: Int, bOff: Int, n: Int,
                           div: Option[Column] = None): Seq[Column] =
    cents.map { case (cid, v) =>
      val dot = (1 to n).map(i =>
        element_at(emb, off + i).cast("double") * lit(v(bOff + i - 1)))
        .reduceLeft(_ + _)
      // `div` normalizes the DOT (dot(x,c)/‖x‖ == dot(x/‖x‖,c)) instead
      // of the elements: materializing a normalized array and indexing
      // into it 16×8 times makes CollapseProject inline the whole
      // 64-term norm fold into every element reference — a 112 MiB task
      // binary at sf0.1. One division per centroid keeps the plan small;
      // the oracle mirrors the same raw-dot-then-divide float path.
      val sd = round(div.map(dot / _).getOrElse(dot), 6)
      struct(sd.as("sd"), lit(-cid).as("ncid"))
    }

  /** Nearest-centroid id as a pure projection (argmax by sd DESC, cid
    * ASC via max over (sd, -cid) structs).
    */
  private def assignCol(emb: Column, cents: Seq[(Long, Array[Double])],
                        off: Int, bOff: Int, n: Int,
                        div: Option[Column] = None): Column =
    -array_max(array(scoreStructs(emb, cents, off, bOff, n, div): _*))
      .getField("ncid")

  /** The `probes` nearest centroid ids, best first, as an array
    * projection: reverse(array_sort) over the same (sd, -cid) structs
    * yields (sd DESC, cid ASC) — element 1 is identical to [[assignCol]],
    * element 2 the runner-up. Multi-probe banding (query side only)
    * widens candidate generation by ≤ probes× with the same exact rerank.
    */
  private def assignTopCol(emb: Column, cents: Seq[(Long, Array[Double])],
                           off: Int, bOff: Int, n: Int,
                           probes: Int): Column = {
    val sorted = reverse(array_sort(
      array(scoreStructs(emb, cents, off, bOff, n): _*)))
    array((1 to probes).map(i =>
      -element_at(sorted, i).getField("ncid")): _*)
  }

  /** The trained per-subspace codebook: (sub, cid, cv[subLen]) — Ks
    * seed-assigned member means per subspace, DECIMAL-exact, learned
    * from the bounded `SampleN` training sample (see [[SampleN]]). M*Ks
    * rows by construction (the PQ codebook is tiny or it isn't PQ).
    */
  def codebook(embeddings: DataFrame, dim: Int, m: Int = M, ks: Int = Ks,
               sampleN: Int = SampleN,
               l2Normalize: Boolean = false): DataFrame = {
    require(dim % m == 0, s"dim $dim must split into $m subspaces")
    val subLen = dim / m
    // One bounded collect (≤ sampleN rows by construction): seeds are the
    // sample's md5-order prefix, and the training relation is rebuilt as
    // a local DataFrame so the m per-subspace branches don't re-run the
    // corpus TakeOrdered m times.
    val raw: Seq[(Long, Array[Double])] =
      sample(embeddings, sampleN).collect()
        .toSeq.map(r => (r.getLong(0),
          r.getSeq[Number](1).map(_.doubleValue).toArray))
    // ADC lane: the codebook lives in L2-NORMALIZED space. The sample is
    // tiny, so normalization happens here on the driver — a sequential
    // left-fold sum of squares over the double-cast elements, the exact
    // float path of the oracle's list_sum(list_transform(v, y -> y*y)).
    val sampRows = if (!l2Normalize) raw else raw.map { case (id, v) =>
      var s = 0.0
      var i = 0
      while (i < v.length) { s += v(i) * v(i); i += 1 }
      val n = math.sqrt(s)
      (id, v.map(_ / n))
    }
    val seedRows = sampRows.take(ks)
    val spark = embeddings.sparkSession
    import spark.implicits._
    val samp = sampRows.map { case (id, v) => (id, v.toSeq) }
      .toDF("vec_id", "embedding")
    val perSub = (0 until m).map { s =>
      val off = s * subLen
      samp.select(lit(s).as("sub"),
        assignCol(col("embedding"), seedRows, off, off, subLen).as("cid"),
        posexplode(expr(s"slice(embedding, ${off + 1}, $subLen)"))
          .as(Seq("pos", "v")))
    }
    perSub.reduce(_ unionByName _)
      .groupBy("sub", "cid", "pos")
      .agg((sum(col("v").cast("double").cast("decimal(27,10)")).cast("double")
        / count(lit(1))).as("c"))
      .groupBy("sub", "cid")
      .agg(sort_array(collect_list(struct(col("pos"), col("c")))).as("pc"))
      .select(col("sub"), col("cid"), expr("transform(pc, x -> x.c)").as("cv"))
  }

  /** Codebook rows collected per subspace (M*Ks rows — the one bounded
    * collect of the PQ pipeline; callers encoding both a corpus and a
    * query side reuse the same collected map instead of re-running the
    * codebook job per encode).
    */
  def collectCodebook(cb: DataFrame): Map[Int, Seq[(Long, Array[Double])]] =
    cb.collect().toSeq
      .map(r => (r.getInt(0), (r.getLong(1),
        r.getSeq[Double](2).toArray)))
      .groupBy(_._1).map { case (s, rows) => s -> rows.map(_._2) }

  /** Encode every vector as M (vec_id, sub, code) rows against the
    * trained codebook — the 4-byte compressed index relation. The
    * codebook is collected (bounded) and unrolled into the projection.
    */
  def encode(embeddings: DataFrame, cb: DataFrame, dim: Int): DataFrame =
    encodeWith(embeddings, collectCodebook(cb), dim)

  private def encodeWith(embeddings: DataFrame,
                         bySub: Map[Int, Seq[(Long, Array[Double])]],
                         dim: Int): DataFrame = {
    val m = bySub.size
    val subLen = dim / m
    (0 until m).map { s =>
      val off = s * subLen
      embeddings.select(col("vec_id"), lit(s).as("sub"),
        assignCol(col("embedding"), bySub(s), off, 0, subLen).as("code"))
    }.reduce(_ unionByName _)
  }

  /** Multi-probe query encoding: for each query vector the top-`probes`
    * centroid codes per subspace — ≤ M·probes (q_id, sub, code) rows per
    * query. Probe codes within a (query, sub) are distinct centroids, so
    * a candidate's single code matches at most one probe per subspace
    * and the n_match count stays ≤ M.
    */
  def encodeProbes(queries: DataFrame, cb: DataFrame, dim: Int,
                   probes: Int): DataFrame =
    encodeProbesWith(queries, collectCodebook(cb), dim, probes)

  private def encodeProbesWith(queries: DataFrame,
                               bySub: Map[Int, Seq[(Long, Array[Double])]],
                               dim: Int, probes: Int): DataFrame = {
    val m = bySub.size
    val subLen = dim / m
    (0 until m).map { s =>
      val off = s * subLen
      queries.select(col("vec_id").as("q_id"), lit(s).as("sub"),
        explode(assignTopCol(col("embedding"), bySub(s), off, 0, subLen,
          probes)).as("code"))
    }.reduce(_ unionByName _)
  }

  /** ADC (asymmetric distance computation) top-k — the classic PQ
    * scoring lane (Jégou et al. 2011 §IV), as the IVFADC-style TWO-STAGE
    * it is in production: (1) a code-only SHORTLIST scan — the query's
    * per-subspace dots against every centroid are precomputed into an
    * AdcM·AdcKs-row lookup table, a candidate's approximate score is the
    * SUM of its codes' LUT entries (the dot with its codebook
    * reconstruction), and the top [[AdcShortlist]] survive; (2) an exact
    * rounded-cosine rerank of the shortlist (the same kernel as pqTopK).
    * The cross-subspace accumulation is taken in integer MICRO-UNITS
    * (each round6 subspace dot fixed to a BIGINT before summing), so the
    * float-order parity hazard that kept ADC out of round 9 is gone: the
    * sum is exact and order-free on both engines.
    *
    * The codebook lives in L2-NORMALIZED space — a reconstruction DOT
    * then approximates COSINE (the trilogy's metric) instead of the
    * norm-dominated raw inner product. The bounded training sample is
    * normalized driver-side at collect time; corpus/query scoring
    * divides each subspace dot by the vector's norm rather than
    * materializing normalized arrays (equal math, small plan — see the
    * scoreStructs `div` note), with the parity-proven left-fold norm
    * (Similarity.normN).
    *
    * Scale shape: stage 1 is where a 100 TB index is scanned at
    * 8 B/vector — full embeddings are touched ONLY on the query side
    * (the broadcast LUT); the corpus contributes nothing but its code
    * relation, and the scan → broadcast-hash-join → partial-sum pipeline
    * never shuffles a float vector. Stage 2 touches full vectors for
    * only `AdcShortlist/corpus` of the data (5% at sf0.01, vanishing at
    * scale) — [[AdcShortlist]] is the recall-vs-I/O knob, and
    * `adc_recall` measures the cost (0.90 at sf0.01).
    */
  def adcTopK(embeddings: DataFrame, queryPred: Column, k: Int,
              dim: Option[Int] = None): DataFrame = {
    val d = dim.getOrElse(Similarity.dimOf(embeddings))
    val subLen = d / AdcM
    // Normalized-space scoring WITHOUT materializing normalized arrays:
    // carry the scalar norm and divide each subspace DOT by it
    // (dot(x,c)/‖x‖ == dot(x/‖x‖,c)) — see the scoreStructs `div` note
    // for why element-wise normalization explodes the plan.
    val embN = embeddings.select(col("vec_id"), col("embedding"),
      Similarity.normN(col("embedding"), d).as("nrm"))
    val bySub = collectCodebook(
      codebook(embeddings, d, AdcM, AdcKs, AdcSampleN, l2Normalize = true))
    val codes = (0 until AdcM).map { s =>
      val off = s * subLen
      embN.select(col("vec_id"), lit(s).as("sub"),
        assignCol(col("embedding"), bySub(s), off, 0, subLen,
          Some(col("nrm"))).as("code"))
    }.reduce(_ unionByName _)
    // Query-side LUT: (q_id, sub, code, sd6) — AdcM·AdcKs rows per query,
    // one explode over a literal struct array per subspace (no join, no
    // exchange to build; broadcast to meet the code relation).
    val lut = (0 until AdcM).map { s =>
      val off = s * subLen
      embN.filter(queryPred).select(
        col("vec_id").as("q_id"), lit(s).as("sub"),
        explode(array(bySub(s).map { case (cid, v) =>
          val dot = (1 to subLen).map(i =>
            element_at(col("embedding"), off + i).cast("double") *
              lit(v(i - 1))).reduceLeft(_ + _)
          val sd = round(dot / col("nrm"), 6)
          struct(lit(cid).as("code"),
            round(sd * lit(1000000)).cast("bigint").as("sd6"))
        }: _*)).as("e"))
        .select(col("q_id"), col("sub"),
          col("e.code").as("code"), col("e.sd6").as("sd6"))
    }.reduce(_ unionByName _)
    val shortlist = codes.join(broadcast(lut), Seq("sub", "code"))
      .filter(col("q_id") =!= col("vec_id"))
      .groupBy(col("q_id"), col("vec_id"))
      .agg(sum("sd6").as("adc6"))
      .withColumn("srank", row_number().over(
        Window.partitionBy("q_id")
          .orderBy(col("adc6").desc, col("vec_id"))))
      .filter(col("srank") <= AdcShortlist)
      .select(col("q_id"), col("vec_id").as("c_id"), col("adc6"))
    def emb(p: String): DataFrame =
      embeddings.select(col("vec_id").as(s"${p}_id"),
        col("embedding").as(s"${p}_emb"),
        Similarity.normN(col("embedding"), d).as(s"${p}_nrm"))
    graft.functions.CosineScore.register(embeddings.sparkSession)
    shortlist
      .join(emb("q"), "q_id").join(emb("c"), "c_id")
      .select(col("q_id").as("query_id"), col("c_id").as("cand_id"),
        col("adc6"),
        expr("cosine_score(q_emb, c_emb, q_nrm, c_nrm)").as("score"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("score").desc, col("cand_id"))))
      .filter(col("rank") <= k)
  }

  /** PQ top-k: multi-probe code-match banding (candidate shares ≥
    * `minMatch` of M codes with any of the query's `probes` nearest
    * centroids per subspace) then exact rerank. Output: (query_id,
    * cand_id, n_match, score, rank).
    */
  def pqTopK(embeddings: DataFrame, queryPred: Column, k: Int,
             minMatch: Int = 1, dim: Option[Int] = None,
             probes: Int = 2): DataFrame = {
    val d = dim.getOrElse(Similarity.dimOf(embeddings))
    // ONE collect of the trained codebook feeds both encode sides — a
    // second collect would re-run the whole training job.
    val bySub = collectCodebook(codebook(embeddings, d))
    val codes = encodeWith(embeddings, bySub, d)
    val qCodes =
      if (probes <= 1) codes.filter(queryPred)
        .select(col("vec_id").as("q_id"), col("sub"), col("code"))
      else encodeProbesWith(embeddings.filter(queryPred), bySub, d, probes)
    val cand = codes.join(broadcast(qCodes), Seq("sub", "code"))
      .filter(col("q_id") =!= col("vec_id"))
      .groupBy(col("q_id"), col("vec_id").as("c_id"))
      .agg(count(lit(1)).as("n_match"))
      .filter(col("n_match") >= minMatch)
    def emb(p: String): DataFrame =
      embeddings.select(col("vec_id").as(s"${p}_id"),
        col("embedding").as(s"${p}_emb"),
        Similarity.normN(col("embedding"), d).as(s"${p}_nrm"))
    graft.functions.CosineScore.register(embeddings.sparkSession)
    val scored = cand
      .join(emb("q"), "q_id").join(emb("c"), "c_id")
      .select(col("q_id").as("query_id"), col("c_id").as("cand_id"),
        col("n_match"),
        expr("cosine_score(q_emb, c_emb, q_nrm, c_nrm)").as("score"))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("score").desc, col("cand_id"))))
      .filter(col("rank") <= k)
  }
}
