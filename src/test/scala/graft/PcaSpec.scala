package graft

import graft.operators.Pca
import org.apache.spark.sql.functions._

/** Specs for the PCA family: census correctness on a hand fixture,
  * component recovery when the spectrum is clean, and the realized-
  * variance == Rayleigh self-consistency on the real fixture (the
  * property that matters for projection even when the near-degenerate
  * spectrum leaves the exact eigenvector unidentified — Pca scaladoc).
  */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  private def embDf(rows: Seq[(Long, Seq[Float])]) =
    rows.toDF("vec_id", "embedding")

  test("covarianceCells: hand-checkable diagonal and cross terms at d=4") {
    // x0 ∈ {-0.2, -0.1, 0, 0.1, 0.2} (mean 0, biased var 0.02),
    // x1 = x0/2 (cov(0,1) = 0.01, var(x1) = 0.005), x2 constant, x3 = 0.
    val rows = Seq(-2, -1, 0, 1, 2).zipWithIndex.map { case (a, id) =>
      (id.toLong, Seq(a * 0.1f, a * 0.05f, 0.3f, 0f))
    }
    val cells = Pca.covarianceCells(embDf(rows), d = 4).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(3)).toMap
    assert(cells.size == 10) // upper triangle of 4x4
    assert(math.abs(cells((0, 0)) - 20000L) <= 1)
    assert(math.abs(cells((0, 1)) - 10000L) <= 1)
    assert(math.abs(cells((1, 1)) - 5000L) <= 1)
    assert(cells((2, 2)) == 0L) // constant dim: zero variance
    assert(cells((2, 3)) == 0L && cells((3, 3)) == 0L)
  }

  test("topComponent: clean spectrum recovers the dominant axis") {
    // Variance concentrated on axis 0; axis 1 carries 4x less. The gap
    // is wide (λ1/λ2 = 4) so 30 rounds converge decisively.
    val rows = (0 until 16).map { k =>
      val s = if (k % 2 == 0) 1f else -1f
      (k.toLong, Seq(s * 0.4f, (if (k % 4 < 2) 1f else -1f) * 0.2f, 0f, 0f))
    }
    val (v, lambda, trace) = Pca.topComponent(embDf(rows), d = 4)
    assert(math.abs(math.abs(v(0)) - 1000000L) < 2000L)
    assert(math.abs(v(1)) < 20000L && math.abs(v(2)) < 2000L)
    // λ = var(x0) = 0.16 → 160000 micro; trace = 0.16 + 0.04 = 0.2
    assert(math.abs(lambda - 160000L) < 2000L)
    assert(math.abs(trace - 200000L) < 2000L)
  }

  test("project realizes the reported Rayleigh variance on the real fixture") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val (v, lambda, _) = Pca.topComponent(emb)
    val den = v.map(x => x * x).sum // v'v in micro^2
    val stats = Pca.project(emb)
      .agg(count(lit(1)).as("n"), sum(col("pc1_micro")).as("s"),
        sum(col("pc1_micro") * col("pc1_micro")).as("ss"))
      .collect()(0)
    val n = stats.getLong(0).toDouble
    val mean = stats.getLong(1) / n
    val varPc = stats.getLong(2) / n - mean * mean
    // Var(X·v) = λ·v'v exactly at the Rayleigh quotient; quantization
    // of pc1 and of λ adds sub-percent noise.
    val expect = lambda.toDouble / 1e6 * den
    assert(math.abs(varPc - expect) / expect < 0.02,
      s"varPc=$varPc expect=$expect")
  }

  test("explained: permille accounting is exact-integer and in range") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val r = Pca.explained(emb).collect()(0)
    val (lam, tr, pm) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(pm == lam * 1000L / tr)
    // 64 near-isotropic dims: the top component explains a few percent,
    // strictly more than the 1/64 isotropic floor.
    assert(pm > 15L && pm < 200L)
  }

  test("secondComponent: deflation finds the runner-up axis, orthogonal to v1") {
    // Same clean fixture as the top-component test: axis 0 carries
    // var 0.16, axis 1 var 0.04 — v2 must land on axis 1 with λ2 ≈
    // 40000 micro, and the residual cross-term must vanish.
    val rows = (0 until 16).map { k =>
      val s = if (k % 2 == 0) 1f else -1f
      (k.toLong, Seq(s * 0.4f, (if (k % 4 < 2) 1f else -1f) * 0.2f, 0f, 0f))
    }
    val (v2, lambda2, cross) = Pca.secondComponent(embDf(rows), d = 4)
    assert(math.abs(math.abs(v2(1)) - 1000000L) < 2000L)
    assert(math.abs(v2(0)) < 20000L && math.abs(v2(2)) < 2000L)
    assert(math.abs(lambda2 - 40000L) < 2000L)
    assert(math.abs(cross) <= 1000L)
  }

  test("second component on the real fixture: lambda2 <= lambda1, near-orthogonal") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val (_, l1, _) = Pca.topComponent(emb)
    val (_, l2, cross) = Pca.secondComponent(emb)
    assert(l2 <= l1 && l2 > 0)
    // cross is v1·v2 div 1e6; unit-scale vectors have v'v ~ 1e12, so
    // |cross| ≤ 1e4 means cos angle ≤ ~1e-2.
    assert(math.abs(cross) < 10000L)
  }

  test("census merge == rebuild (incremental-ingest contract)") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val merged = Pca.covarianceFromCensus(Pca.mergeCensus(Seq(
      Pca.covarianceCensus(emb.filter(col("vec_id") % 5 =!= 0)),
      Pca.covarianceCensus(emb.filter(col("vec_id") % 5 === 0)))))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val direct = Pca.covarianceCells(emb)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(merged == direct)
  }

  test("covariance census fuzz: exact match against an independent reference") {
    // Seeded random float corpora vs a from-scratch driver computation
    // of the same integer contract (round half-away-from-zero per-row
    // products, exact long sums, the one finishing double expression).
    val rnd = new scala.util.Random(20260814L)
    def r0(x: Double): Long =
      if (x < 0) -Math.round(-x) else Math.round(x)
    (1 to 3).foreach { trial =>
      val d = Seq(3, 5, 8)(trial - 1)
      val n = 20 + trial * 7
      val vecs = Seq.fill(n)(Array.fill(d)(rnd.nextFloat() * 2 - 1))
      val df = vecs.zipWithIndex
        .map { case (v, i) => (i.toLong, v.toSeq) }.toDF("vec_id", "embedding")
      val got = Pca.covarianceCells(df, d).collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(3)).toMap
      val s1 = Array.tabulate(d)(i =>
        vecs.map(v => r0(v(i).toDouble * 1000000)).sum)
      for (i <- 0 until d; j <- i until d) {
        val s2 = vecs.map(v =>
          r0(v(i).toDouble * v(j).toDouble * 1000000)).sum
        val want = r0((s2.toDouble - s1(i).toDouble * s1(j) /
          (n.toDouble * 1000000)) / n)
        assert(got((i, j)) == want,
          s"trial $trial cell ($i,$j): got ${got((i, j))} want $want")
      }
    }
  }

  test("streaming-style census accumulation: batch-by-batch merge == rebuild") {
    // The incremental-ingest story end-to-end: the corpus arrives in 4
    // arbitrary batches, each censuses ALONE, the running census folds
    // batch censuses pairwise (as a foreachBatch sink would), and the
    // fold must finish to the identical covariance relation as one
    // rebuild over everything — regardless of batch sizes or order.
    val emb = Tables.load(spark, sfDir, "embeddings")
    val batches = Seq(
      emb.filter(col("vec_id") % 4 === 0), emb.filter(col("vec_id") % 4 === 2),
      emb.filter(col("vec_id") % 4 === 3), emb.filter(col("vec_id") % 4 === 1))
    val folded = batches.map(b => Pca.covarianceCensus(b))
      .reduce((acc, b) => Pca.mergeCensus(Seq(acc, b)))
    val got = Pca.covarianceFromCensus(folded).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val want = Pca.covarianceCells(emb).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got == want)
  }

  test("projectTwo: the 2-D coordinates decorrelate and carry the two Rayleighs") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val (_, l1, _) = Pca.topComponent(emb)
    val (_, l2, _) = Pca.secondComponent(emb)
    val rows = Pca.projectTwo(emb).collect()
      .map(r => (r.getLong(1).toDouble, r.getLong(2).toDouble))
    val n = rows.length.toDouble
    val (m1, m2) = (rows.map(_._1).sum / n, rows.map(_._2).sum / n)
    val var1 = rows.map(p => (p._1 - m1) * (p._1 - m1)).sum / n
    val var2 = rows.map(p => (p._2 - m2) * (p._2 - m2)).sum / n
    val cov12 = rows.map(p => (p._1 - m1) * (p._2 - m2)).sum / n
    // each coordinate realizes its component's Rayleigh variance
    // (Var(X·v) = λ·v'v; v'v ~ 1e12 within quantization slack)
    assert(math.abs(var1 / 1e6 - l1.toDouble) / l1 < 0.05,
      s"pc1 var ${var1 / 1e6} vs λ1 $l1")
    assert(math.abs(var2 / 1e6 - l2.toDouble) / l2 < 0.05,
      s"pc2 var ${var2 / 1e6} vs λ2 $l2")
    // orthogonal components -> decorrelated coordinates
    assert(math.abs(cov12) / math.sqrt(var1 * var2) < 0.05,
      s"pc1/pc2 correlated: ${cov12 / math.sqrt(var1 * var2)}")
  }

  test("jlDistortion: deviation shrinks with target dim and is unbiased-centered") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val out = Pca.jlDistortion(emb).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out.keySet == Set(8L, 16L, 32L))
    // JL concentration: mean |ratio-1| falls as the target dim grows
    assert(out(8L)._2 > out(16L)._2 && out(16L)._2 > out(32L)._2,
      s"deviation not shrinking: $out")
    // unbiasedness: even at k=8 the mean deviation stays under the
    // ~sqrt(2/k) Rademacher spread with slack (< 0.7 in micro units)
    assert(out(8L)._2 < 700000L)
    assert(out.values.map(_._1).toSet.size == 1) // same pair set per k
  }

  test("JL overflow guards still raise loudly in the once-per-row form") {
    // jlDistortion at kMax=32, d=64: bound ≈ 2.96e6 micro units — a
    // 5.0f cell (5e6 micro) must raise, never wrap. Pairs need
    // consecutive ids, and the clean row proves the guard passes
    // in-range rows through.
    val bad = embDf(Seq(
      (1L, Seq.fill(64)(0.1f)),
      (2L, Seq.tabulate(64)(i => if (i == 3) 5.0f else 0.1f))))
    val e1 = intercept[Exception] { Pca.jlDistortion(bad).collect() }
    assert(e1.getMessage.contains("exact-long bound"), e1.getMessage)
    // jlProject at d=64: bound = Long.MaxValue/2/64 ≈ 7.2e16 micro
    val huge = embDf(Seq(
      (1L, Seq.fill(64)(0.1f)),
      (2L, Seq.tabulate(64)(i => if (i == 0) 1e12f else 0.1f))))
    val e2 = intercept[Exception] { Pca.jlProject(huge, 64, 16).collect() }
    assert(e2.getMessage.contains("exact-long bound"), e2.getMessage)
    // in-range corpus sails through both guarded lanes
    val ok = embDf((1L to 4L).map(i => (i, Seq.fill(64)(0.1f * i))))
    assert(Pca.jlProject(ok, 64, 16).count() == 4L)
    assert(Pca.jlDistortion(ok).collect().nonEmpty)
  }

  test("covarianceCells rejects out-of-contract width") {
    val df = embDf(Seq((1L, Seq(0.1f, 0.2f))))
    intercept[IllegalArgumentException] {
      Pca.covarianceCells(df, d = 65)
    }
  }

  test("standardize: z-scores center, scale, and flag the planted outlier") {
    // dim 0: values 0.1/0.3 alternating (μ=0.2, σ=0.1) except one
    // far-out row at 0.9 which must carry z > 3σ; dim 1 constant-ish
    // with variance (else the operator rejects).
    val base = (0 until 20).map { k =>
      (k.toLong, Seq(if (k % 2 == 0) 0.1f else 0.3f,
        if (k % 2 == 0) -0.5f else 0.5f))
    }
    val rows = base :+ (99L, Seq(0.9f, 0.5f))
    val out = Pca.standardize(embDf(rows), d = 2).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(99L)._2 == 1L) // only dim 0 is beyond 3σ for the outlier
    assert(base.forall { case (id, _) => out(id.toLong)._2 == 0L })
    // z of the planted row on dim 0 is strongly positive; a below-mean
    // row is negative — read back from the milli string
    val z99 = out(99L)._1.split(" ").map(_.toLong)
    val z0 = out(0L)._1.split(" ").map(_.toLong)
    assert(z99(0) > 3000L && z0(0) < 0L)
  }

  test("standardize rejects a zero-variance dimension loudly") {
    val rows = (0 until 8).map(k => (k.toLong, Seq(k * 0.1f, 0.5f)))
    val ex = intercept[IllegalArgumentException] {
      Pca.standardize(embDf(rows), d = 2)
    }
    assert(ex.getMessage.contains("zero-variance"))
  }
}
