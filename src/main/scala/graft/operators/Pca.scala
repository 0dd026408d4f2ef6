package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Principal-component analysis over the embedding corpus — the
  * dimensionality-reduction step an embedding pipeline runs before ANN
  * indexing (and the rotation step OPQ-style quantizers train; Jégou et
  * al. 2011 §V uses exactly this covariance+eigensolve shape). Three
  * faces:
  *
  *  - [[covarianceCells]]: the exact-integer covariance census — the
  *    ONLY pass over the corpus. Each row emits its d(d+1)/2
  *    upper-triangle products (plus d first-order terms) quantized to
  *    integer micro-units, and ONE hash aggregation with map-side
  *    partials reduces them: the shuffle carries at most d(d+1)/2+d
  *    rows per partition no matter the corpus size. cov(i,j) is then a
  *    deterministic double expression over exact longs.
  *  - [[topComponent]]: the dominant eigenvector by QUANTIZED power
  *    iteration on the collected census (O(d²) driver state — the same
  *    bounded codebook contract as the IVF centroid / PQ codebook
  *    collects). Every iterate is quantized to integer micro-units, so
  *    the whole trajectory is exact-integer reproducible: the DuckDB
  *    oracle replays all 30 steps bit-for-bit as an unrolled CTE chain.
  *  - [[project]]: the corpus projected onto the learned component —
  *    per-row map work (a zip_with dot product against the broadcast
  *    literal vector), no shuffle, the 100 TB path.
  *
  * Convergence contract: the fixture spectrum is near-degenerate
  * (λ1/λ2 ≈ 1.01), so 30 power steps need NOT identify the exact
  * eigenvector — and the operator's contract is deliberately "the
  * 30-step quantized iterate", which both engines compute identically.
  * What the step count DOES guarantee is captured variance: the
  * Rayleigh quotient converges at the square of the iterate's rate, and
  * [[explained]] reports exactly that (λ(v₃₀) and its share of total
  * variance) — for projection, any direction within the top eigenspace
  * at that Rayleigh value is equally good. PcaSpec asserts the
  * projection's realized variance equals the reported λ.
  *
  * Integer ranges: products quantize at 1e6, matvec terms stay exact
  * longs, and the norm accumulates (|t|/1e5)² — see the inline notes at
  * each step. The ranges are NOT unconditional: they hold for
  * unit-scale embeddings (fixture |cov_micro| ≤ ~3.4e5), and the code
  * enforces them LOUDLY instead of wrapping — [[censusMatrix]] rejects
  * a census whose cells could overflow the matvec or norm
  * accumulators, [[powerLoop]] guards each iterate before squaring,
  * and [[jlDistortion]] raises per-row when an embedding exceeds its
  * exact-sum bound (ADVICE r12 #1: a silent wrap would break the
  * cross-engine bit-parity contract, so out-of-range input is an
  * error, never a wrong answer).
  */
object Pca {

  /** Embedding width of the fixture corpus. */
  val Dim = 64

  /** Power-iteration steps — part of the cross-engine contract (the
    * oracle unrolls exactly this many CTE rounds).
    */
  val Rounds = 30

  /** Round half-away-from-zero — the ONE rounding spelling shared with
    * Spark's `round` (BigDecimal HALF_UP) and DuckDB's `round`;
    * `Math.round` alone is half-UP (toward +∞) and disagrees on
    * negative midpoints.
    */
  private def rnd(x: Double): Long =
    if (x < 0) -Math.round(-x) else Math.round(x)

  /** Upper-triangle covariance census: (i, j, n, cov_micro) with
    * cov_micro = round(1e6 · Cov(xᵢ, xⱼ)) computed from exact-long
    * micro-quantized sums. One corpus scan: each row's second-order
    * products and first-order terms ride ONE generated array and ONE
    * explode, so the aggregation's map-side partials bound the shuffle
    * at d(d+1)/2 + d rows per partition.
    *
    * Determinism: round(xᵢ·xⱼ·1e6) and round(xᵢ·1e6) quantize PER ROW
    * (floats widen to double exactly), sums are exact longs, and the
    * final covariance is one fixed double expression over those longs —
    * identical bits on any engine, any partitioning.
    */
  def covarianceCells(embeddings: DataFrame, d: Int = Dim): DataFrame =
    covarianceFromCensus(covarianceCensus(embeddings, d), d)

  /** The raw additive census behind [[covarianceCells]]: (cell, n, s)
    * partial sums. ADDITIVE by construction — the census of a union is
    * the cell-wise sum of the censuses — which is the incremental-
    * ingest contract: a delta batch censuses alone and merges with the
    * standing census without rescanning standing data
    * ([[mergeCensus]]; `pca_census_merge` proves merge == rebuild).
    */
  def covarianceCensus(embeddings: DataFrame, d: Int = Dim): DataFrame = {
    require(d >= 2 && d <= 64, s"covarianceCensus: d=$d outside [2,64]")
    val d1 = d - 1
    val cellsExpr =
      s"""concat(
         |  flatten(transform(sequence(0, $d1), i ->
         |    transform(sequence(i, $d1), j ->
         |      named_struct(
         |        'cell', i * $d + j,
         |        'pm', cast(round(cast(embedding[i] as double)
         |                * cast(embedding[j] as double) * 1000000) as bigint))))),
         |  transform(sequence(0, $d1), i ->
         |    named_struct(
         |      'cell', ${d * d} + i,
         |      'pm', cast(round(cast(embedding[i] as double) * 1000000) as bigint))))
         |""".stripMargin
    graft.Tables.spread(embeddings)
      .select(explode(expr(cellsExpr)).as("c"))
      .select(col("c.cell").as("cell"), col("c.pm").as("pm"))
      .groupBy("cell")
      .agg(count(lit(1)).as("n"), sum(col("pm")).as("s"))
  }

  /** Cell-wise sum of censuses — exact long adds, any batch order. */
  def mergeCensus(parts: Seq[DataFrame]): DataFrame =
    parts.reduce(_ unionByName _)
      .groupBy("cell")
      .agg(sum(col("n")).as("n"), sum(col("s")).as("s"))

  /** Finish a census into (i, j, n, cov_micro) rows. */
  def covarianceFromCensus(census: DataFrame, d: Int = Dim): DataFrame = {
    val second = census.filter(col("cell") < d * d)
      .select(expr(s"cast(cell div $d as int)").as("i"),
        pmod(col("cell"), lit(d)).cast("int").as("j"),
        col("n"), col("s").as("s2"))
    val first = census.filter(col("cell") >= d * d)
      .select((col("cell") - d * d).cast("int").as("k"), col("s").as("s1"))
    second
      .join(first.select(col("k").as("i"), col("s1").as("s1i")), "i")
      .join(first.select(col("k").as("j"), col("s1").as("s1j")), "j")
      .select(col("i"), col("j"), col("n"),
        round((col("s2").cast("double") -
          col("s1i").cast("double") * col("s1j") /
            (col("n").cast("double") * lit(1000000))) / col("n"))
          .cast(LongType).as("cov_micro"))
      .orderBy("i", "j")
  }

  /** The 30-step quantized power iterate of the covariance census plus
    * its Rayleigh quotient and the census trace: (v_micro[d],
    * lambda_micro, trace_micro). Driver state is the collected census —
    * d(d+1)/2 longs, the bounded codebook contract.
    *
    * Every arithmetic step is either an exact long op or a fixed double
    * expression over exact longs (see the range notes inline), so the
    * DuckDB oracle's unrolled CTE chain reproduces each iterate
    * bit-for-bit.
    */
  def topComponent(embeddings: DataFrame, d: Int = Dim,
                   rounds: Int = Rounds): (Array[Long], Long, Long) = {
    val c = censusMatrix(embeddings, d)
    val v = powerLoop(c, d, rounds, Array.fill(d)(1000000L), None)
    var trace = 0L; var i = 0
    while (i < d) { trace += c(i)(i); i += 1 }
    (v, rayleigh(c, d, v), trace)
  }

  /** The SECOND component: the same quantized power iteration with each
    * matvec orthogonalized against the first component before
    * normalization (deflation by projection — integer-exact like every
    * other step, so the oracle replays it). The alternating-sign start
    * vector guarantees a component off v₁ generically. Returns
    * (v2_micro, λ2_micro, v1·v2 div 1e6 — the residual cross-term, ~0).
    */
  def secondComponent(embeddings: DataFrame, d: Int = Dim,
                      rounds: Int = Rounds): (Array[Long], Long, Long) = {
    val c = censusMatrix(embeddings, d)
    val v1 = powerLoop(c, d, rounds, Array.fill(d)(1000000L), None)
    val w0 = Array.tabulate(d)(i => if (i % 2 == 0) 1000000L else -1000000L)
    val v2 = powerLoop(c, d, rounds, w0, Some(v1))
    var cross = 0L; var i = 0
    while (i < d) { cross += v1(i) * v2(i); i += 1 }
    val crossq = if (cross < 0) -(math.abs(cross) / 1000000L)
                 else math.abs(cross) / 1000000L
    (v2, rayleigh(c, d, v2), crossq)
  }

  /** BOTH leading components from ONE census: v1 = the standard
    * 30-round iterate, v2 = the deflated iterate ([[secondComponent]]'s
    * machinery without re-collecting the census) — what a
    * multi-component OPQ rotation composes its reflections from
    * (VERDICT r19 #4).
    */
  def topTwoComponents(embeddings: DataFrame, d: Int = Dim,
                       rounds: Int = Rounds): (Array[Long], Array[Long]) = {
    val c = censusMatrix(embeddings, d)
    val v1 = powerLoop(c, d, rounds, Array.fill(d)(1000000L), None)
    val w0 = Array.tabulate(d)(i => if (i % 2 == 0) 1000000L else -1000000L)
    (v1, powerLoop(c, d, rounds, w0, Some(v1)))
  }

  /** Collected symmetric census matrix — d(d+1)/2 longs of driver
    * state, the bounded codebook contract.
    */
  private def censusMatrix(embeddings: DataFrame, d: Int): Array[Array[Long]] = {
    val cells = covarianceCells(embeddings, d).collect()
    val c = Array.ofDim[Long](d, d)
    cells.foreach { r =>
      val i = r.getInt(0); val j = r.getInt(1); val cm = r.getLong(3)
      c(i)(j) = cm; c(j)(i) = cm
    }
    // Loud range check (ADVICE r12 #1): the exact-long contract needs
    //  - matvec:   |t_i| ≤ d·maxC·1e6            < 2^63 / 4
    //  - norm:     d·(|t_i|/1e5)² = 100·d³·maxC² < 2^63 / 2
    // (norm is the binding one: maxC ≤ sqrt(2^63/(200·d³)), ≈ 4.2e5 at
    // d=64 — unit-scale embeddings; |x| up to 1000 would put cov_micro
    // near 1e12 and silently wrap, breaking bit parity).
    val maxC = c.iterator.flatten.map(math.abs).max
    val matvecCap = Long.MaxValue / 4 / d / 1000000L
    val normCap = math.sqrt(Long.MaxValue.toDouble / 2 / (100.0 * d * d * d)).toLong
    require(maxC <= math.min(matvecCap, normCap),
      s"Pca census out of exact-long range: max |cov_micro| = $maxC exceeds " +
        s"min(matvec cap $matvecCap, norm cap $normCap) at d=$d — the " +
        "integer power iteration would overflow; rescale embeddings to " +
        "unit scale first")
    c
  }

  // |C|≤~1e6 micro (|x|≤1000 ⇒ diag ≤1e12... fixture ≤3.4e5), |v|≤1e6
  // ⇒ |t| ≤ d·|C|·1e6 ≤ 2.2e13 for the fixture: exact long.
  private def matvec(c: Array[Array[Long]], d: Int,
                     v: Array[Long]): Array[Long] =
    Array.tabulate(d) { i =>
      var s = 0L; var j = 0
      while (j < d) { s += c(i)(j) * v(j); j += 1 }
      s
    }

  /** Truncate-toward-zero shrink by 1e6 — spelled sign·(|x| div 1e6)
    * on both engines, because `div`/`//` negative semantics differ.
    */
  private def shrink6(x: Long): Long =
    if (x < 0) -(math.abs(x) / 1000000L) else math.abs(x) / 1000000L

  private def powerLoop(c: Array[Array[Long]], d: Int, rounds: Int,
                        v0: Array[Long],
                        ortho: Option[Array[Long]]): Array[Long] = {
    var v = v0
    var k = 0
    while (k < rounds) {
      var t = matvec(c, d, v)
      ortho.foreach { u =>
        // Project out u: t' = t − α·u with α = (t·u)/(u'u) from
        // pre-shrunk exact products (num ≤ 2.2e7·1e6·64 = 1.4e15,
        // den = u'u ≤ 6.4e13 — exact), α rounded to an integer ONCE
        // (α is t-scale / u-scale ~ 1e7; integer rounding is ≤5e-8
        // relative), then an exact long subtraction (α·u ≤ 1.4e15).
        var num = 0L; var den = 0L; var i = 0
        while (i < d) { num += shrink6(t(i)) * u(i); den += u(i) * u(i); i += 1 }
        val alpha = rnd(num.toDouble * 1000000 / den)
        // α·u must stay an exact long product (|u| ≤ ~1e6)
        require(math.abs(alpha) <= Long.MaxValue / 8 / 1000000L,
          s"Pca deflation coefficient out of exact-long range: alpha=$alpha")
        t = Array.tabulate(d)(i => t(i) - alpha * u(i))
      }
      // (|t|/1e5)² ≤ (2.2e8)² = 4.8e16; ×64 = 3.1e18 < 2^63: exact long.
      // The census guard proves this for the pre-deflation t; the
      // runtime check below backstops the deflated iterate too (the
      // worst-case Cauchy–Schwarz bound on t−α·u is looser than the
      // realized one — fail loudly rather than wrap).
      val qCap = math.sqrt(Long.MaxValue.toDouble / d).toLong
      var ss = 0L
      t.foreach { ti =>
        val q = math.abs(ti) / 100000L
        require(q <= qCap,
          s"Pca iterate out of exact-long norm range: |t|/1e5 = $q > $qCap")
        ss += q * q
      }
      val nrm = math.sqrt(ss.toDouble)
      // t·10/√ss rescales the 1e5-unit norm back to a 1e6-unit vector.
      v = t.map(ti => rnd(ti.toDouble * 10.0 / nrm))
      k += 1
    }
    v
  }

  /** Rayleigh λ = v'Cv / v'v from pre-shrunk exact products:
    * (t/1e6)·v ≤ 2.2e7·1e6·64 = 1.4e15 exact; v'v ≤ 6.4e13 exact.
    */
  private def rayleigh(c: Array[Array[Long]], d: Int,
                       v: Array[Long]): Long = {
    val t = matvec(c, d, v)
    var num = 0L; var den = 0L; var i = 0
    while (i < d) { num += shrink6(t(i)) * v(i); den += v(i) * v(i); i += 1 }
    rnd(num.toDouble * 1000000 / den)
  }

  /** [[topComponent]] as a relation: one row per dimension
    * (i, v_micro, lambda_micro).
    */
  def topComponentDf(embeddings: DataFrame, d: Int = Dim,
                     rounds: Int = Rounds): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val (v, lambda, _) = topComponent(embeddings, d, rounds)
    v.toSeq.zipWithIndex.map { case (vm, i) => (i, vm, lambda) }
      .toDF("i", "v_micro", "lambda_micro")
  }

  /** [[secondComponent]] as a relation: one row per dimension
    * (i, v_micro, lambda_micro, cross_micro) — cross_micro is the
    * v₁·v₂ residual (div 1e6), pinned ~0 by the deflation.
    */
  def secondComponentDf(embeddings: DataFrame, d: Int = Dim,
                        rounds: Int = Rounds): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val (v2, lambda2, cross) = secondComponent(embeddings, d, rounds)
    v2.toSeq.zipWithIndex.map { case (vm, i) => (i, vm, lambda2, cross) }
      .toDF("i", "v_micro", "lambda_micro", "cross_micro")
  }

  /** Variance accounting for the learned component: one row
    * (lambda_micro, trace_micro, explained_permille). The permille is
    * exact integer arithmetic (λ·1000 div trace).
    */
  def explained(embeddings: DataFrame, d: Int = Dim,
                rounds: Int = Rounds): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val (_, lambda, trace) = topComponent(embeddings, d, rounds)
    Seq((lambda, trace, lambda * 1000L / trace))
      .toDF("lambda_micro", "trace_micro", "explained_permille")
  }

  /** Johnson–Lindenstrauss random-projection distortion gauge — the
    * DATA-INDEPENDENT counterpart of the PCA lanes: project with a
    * deterministic Rademacher (±1) matrix (sign = popcount parity of
    * the Knuth multiplicative hash of the cell index — replayable on
    * both engines via bit_count, validated to track true-random JL
    * spread; NO training pass over the corpus at all) and measure, over consecutive-id vector pairs, how
    * far the projected squared distance drifts from the original at
    * target dims {8, 16, 32}. E[‖P(a−b)‖²] = k·‖a−b‖² for Rademacher
    * rows, so ratio_micro centers on 1e6 and its spread shrinks ~1/√k
    * — the curve that says which target dim is safe before an ANN
    * index is built on the projection.
    *
    * Per target dim: pair count, mean and max |ratio − 1e6|. EVERYTHING
    * up to the single ratio division is exact long arithmetic (the ±1
    * matrix means the projection is integer sums of the micro-quantized
    * inputs — no doubles at all), so both engines agree bit-for-bit.
    * One corpus pass for the projection, one id-shifted self-join for
    * the pairs, a 3-entry explode for the targets.
    */
  def jlDistortion(embeddings: DataFrame, d: Int = Dim,
                   targets: Seq[Int] = Seq(8, 16, 32)): DataFrame = {
    require(targets.nonEmpty && targets.forall(t => t >= 1 && t <= 64),
      s"jlDistortion: targets=$targets")
    val kMax = targets.max
    // Exact-long bound (ADVICE r12 #1): |z_k| ≤ d·X, |dz| ≤ 2dX, and
    // dp2 sums kMax of dz² — need kMax·4d²X² < 2^62, i.e. X (micro
    // units) ≤ sqrt(2^62/(4·kMax·d²)) ≈ 2.1e6 at d=kMax=64. Quantize +
    // guard + project run as ONE native kernel call per row
    // ([[graft.functions.JlKernels]]): the r13 declarative form's
    // kMax×d interpreted-HOF projection measured ~0.6 s standalone but
    // a consistent ~2.4 s inside the full bench suite with identical
    // plans (lambda-interpreter JIT profile pollution from the other
    // 224 queries — r14 bisection: the guard rewrite alone recovered
    // the standalone number and did NOT move the in-suite number); a
    // primitive-loop kernel inside WholeStageCodegen is immune. The
    // guard throws the same "exact-long bound" error per row. The
    // kernel rides as a GENERATOR child (explode of a 1-element
    // array), so CollapseProject can't duplicate it per field
    // reference — the r11 ccid pitfall.
    val xMaxMicro = math.sqrt(Long.MaxValue.toDouble / 2 /
      (4.0 * kMax * d * d)).toLong
    graft.functions.JlKernels.register(embeddings.sparkSession)
    val side = graft.Tables.spread(embeddings)
      .select(col("vec_id"),
        explode(array(expr(
          s"jl_parts(embedding, $d, $kMax, ${xMaxMicro}L)"))).as("p"))
      .select(col("vec_id"), col("p.z").as("z"), col("p.x").as("x"))
    val pairs = side.alias("a")
      .join(side.alias("b"), col("b.vec_id") === col("a.vec_id") + 1)
      .select(col("a.vec_id").as("pair_id"),
        expr("zip_with(a.z, b.z, (p, q) -> p - q)").as("dz"),
        expr("aggregate(zip_with(a.x, b.x, (p, q) -> (p - q) * (p - q)), " +
          "0L, (acc, v) -> acc + v)").as("do2"))
      .filter(col("do2") > 0L) // identical vectors carry no distance signal
    val kt = targets.map(_.toLong).mkString("array(", "L, ", "L)")
    val dev = pairs
      .select(col("pair_id"), col("do2"), explode(expr(
        s"""transform($kt, t -> named_struct(
           |  'k', t,
           |  'dp2', aggregate(slice(dz, 1, cast(t as int)), 0L,
           |           (acc, v) -> acc + v * v)))""".stripMargin)).as("s"))
      .select(col("s.k").as("target_dim"),
        expr("abs(cast(round(cast(s.dp2 as double) * 1000000" +
          " / (s.k * do2)) as bigint) - 1000000)").as("dev"))
    dev.groupBy("target_dim")
      .agg(count(lit(1)).as("n_pairs"),
        expr("sum(dev) div count(1)").as("mean_dev_micro"),
        max(col("dev")).as("max_dev_micro"))
      .orderBy("target_dim")
  }

  /** The corpus REDUCED to `k` dimensions by the same data-independent
    * integer Rademacher projection [[jlDistortion]] gauges — as a
    * (vec_id, embedding: array<float>) relation every downstream ANN
    * face accepts unchanged. This is the composition the distortion
    * gauge exists to license: measure the JL deviation at a target k,
    * then actually INDEX at that k (`pca_ann_recall` buckets sign-LSH
    * on the 16-dim reduction, reranks co-bucket candidates full-dim,
    * and gates recall@3 against full-dim brute force — ranking INSIDE
    * the reduced space collapses on a near-orthogonal corpus; the
    * bucket/rerank split is the honest operating point).
    * One scan, no training pass, no shuffle — the projection is
    * a per-row map whose signs come from popcount parity, so any engine
    * replays it bit-exactly: z_k is an exact long in micro units and
    * the float cell is double(z)/1e6 rounded once to float (the same
    * parquet-float width the raw corpus ships).
    */
  def jlProject(embeddings: DataFrame, d: Int = Dim,
                k: Int = 16): DataFrame = {
    graft.functions.JlKernels.register(embeddings.sparkSession)
    graft.Tables.spread(embeddings)
      .select(col("vec_id"), jlProjectCol(d, k).as("embedding"))
  }

  /** [[jlProject]]'s projection as a per-row COLUMN over `embedding` —
    * composable inside another operator's scan (e.g.
    * [[Similarity.signLshTopKOn]] bucketing on the reduction while
    * scoring full-dim) with no join and no second pass.
    */
  def jlProjectCol(d: Int = Dim, k: Int = 16): org.apache.spark.sql.Column = {
    require(k >= 1 && k <= 64, s"jlProjectCol: k=$k outside [1,64]")
    require(d >= 1 && d <= 64, s"jlProjectCol: d=$d outside [1,64]")
    // exact-long z: |z_k| ≤ d·X — quantize + guard + project as one
    // native kernel call ([[graft.functions.JlKernels]], see
    // [[jlDistortion]]'s rationale); the per-row guard throws the same
    // loud "exact-long bound" error, never a silent wrap. Callers
    // without a graft-extensions session must register the kernel
    // ([[jlProject]] does; a bare-Column composition site registers on
    // its own session).
    val xMaxMicro = Long.MaxValue / 2 / d
    expr(s"jl_project(embedding, $d, $k, ${xMaxMicro}L)")
  }

  /** The corpus projected onto the learned TWO-component subspace in
    * one pass: (vec_id, pc1_micro, pc2_micro) — the inputs a
    * cluster/visualize/stratify step consumes. Same integer contract
    * as [[project]], both dot products against literal vectors in the
    * same per-row map (no join, no shuffle, one scan).
    */
  def projectTwo(embeddings: DataFrame, d: Int = Dim,
                 rounds: Int = Rounds): DataFrame = {
    val c = censusMatrix(embeddings, d)
    val v1 = powerLoop(c, d, rounds, Array.fill(d)(1000000L), None)
    val w0 = Array.tabulate(d)(i => if (i % 2 == 0) 1000000L else -1000000L)
    val v2 = powerLoop(c, d, rounds, w0, Some(v1))
    def dotExpr(v: Array[Long]) =
      s"""aggregate(
         |  zip_with(embedding, ${v.mkString("array(", "L, ", "L)")},
         |    (x, vv) -> cast(round(cast(x as double) * 1000000) as bigint) * vv),
         |  0L, (acc, p) -> acc + p)""".stripMargin
    def pc(s: String) =
      s"case when $s < 0 then -((abs($s) + 500000) div 1000000) " +
        s"else (abs($s) + 500000) div 1000000 end"
    graft.Tables.spread(embeddings)
      .select(col("vec_id"), expr(dotExpr(v1)).as("s1"),
        expr(dotExpr(v2)).as("s2"))
      .select(col("vec_id"), expr(pc("s1")).as("pc1_micro"),
        expr(pc("s2")).as("pc2_micro"))
      .orderBy("vec_id")
  }

  /** Per-dimension z-score standardization (whitening without
    * rotation) — the feature-normalization step before any
    * distance-based downstream (ANN, clustering, dedup): zᵢ =
    * (xᵢ − μᵢ)/σᵢ in integer MILLI units, plus the per-vector count of
    * |z| > 3σ cells (`n_out3` — the cheap per-row outlier gauge).
    *
    * μ and σ come from ONE collected census (the same d-bounded driver
    * state as [[topComponent]]), quantized once to micro units; the
    * standardization itself is a per-row map against two literal
    * arrays — no join, no shuffle, the 100 TB path. Zero-variance
    * dimensions are rejected loudly (a constant column has no z-score;
    * silently emitting ±inf would poison every downstream distance).
    */
  def standardize(embeddings: DataFrame, d: Int = Dim): DataFrame = {
    val census = covarianceCensus(embeddings, d).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    val n = census(0)._1
    val s1 = Array.tabulate(d)(i => census(d * d + i)._2)
    val mu = s1.map(s => rnd(s.toDouble / n))
    val sg = Array.tabulate(d) { i =>
      val s2 = census(i * d + i)._2
      // the SAME finished-cell expression as covarianceFromCensus
      val cm = rnd((s2.toDouble - s1(i).toDouble * s1(i) /
        (n.toDouble * 1000000)) / n)
      rnd(math.sqrt(cm.toDouble * 1000000))
    }
    require(sg.forall(_ > 0L),
      "standardize: zero-variance dimension(s) " +
        sg.zipWithIndex.collect { case (s, i) if s <= 0L => i }.mkString(","))
    val muLit = mu.mkString("array(", "L, ", "L)")
    val sgLit = sg.mkString("array(", "L, ", "L)")
    val zArr =
      s"""zip_with(zip_with(embedding, $muLit,
         |  (x, m) -> cast(round(cast(x as double) * 1000000) as bigint) - m),
         |  $sgLit,
         |  (nm, sg) -> cast(round(cast(nm as double) * 1000 / sg) as bigint))
         |""".stripMargin
    graft.Tables.spread(embeddings)
      .select(col("vec_id"), expr(zArr).as("__z"))
      .select(col("vec_id"),
        expr("array_join(__z, ' ')").as("z"),
        expr("cast(size(filter(__z, a -> abs(a) > 3000)) as bigint)")
          .as("n_out3"))
      .orderBy("vec_id")
  }

  /** The corpus projected onto the learned component: (vec_id,
    * pc1_micro) with pc1_micro = round(Σᵢ round(xᵢ·1e6)·vᵢ / 1e6) —
    * the rounding spelled as exact integer half-away-from-zero
    * ((|s|+5e5) div 1e6, signed), so no double appears after the
    * quantized dot product. Per-row map against the literal vector
    * (64 longs folded into the plan): no join, no shuffle — the piece
    * that actually touches 100 TB.
    */
  def project(embeddings: DataFrame, d: Int = Dim,
              rounds: Int = Rounds): DataFrame = {
    val (v, _, _) = topComponent(embeddings, d, rounds)
    val vlit = v.mkString("array(", "L, ", "L)")
    val dot =
      s"""aggregate(
         |  zip_with(embedding, $vlit,
         |    (x, vv) -> cast(round(cast(x as double) * 1000000) as bigint) * vv),
         |  0L, (acc, p) -> acc + p)""".stripMargin
    graft.Tables.spread(embeddings)
      .select(col("vec_id"), expr(dot).as("s"))
      .select(col("vec_id"),
        expr("case when s < 0 then -((abs(s) + 500000) div 1000000) " +
          "else (abs(s) + 500000) div 1000000 end").as("pc1_micro"))
      .orderBy("vec_id")
  }
}
