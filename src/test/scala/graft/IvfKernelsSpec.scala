package graft

import graft.functions.IvfKernels
import org.apache.spark.sql.functions._

/** Expression-level contract tests for the native IVF assignment
  * kernel (same tier as [[PqKernelsSpec]]): the end-to-end gate proves
  * oracle parity of the ivf faces; these pin the kernel's own semantics
  * — unrounded-cosine ranking, (score DESC, cid ASC) total order under
  * java.lang.Double.compare (NaN worst), norm fold, take-capping, null
  * propagation — against an independent in-test reference.
  */
class IvfKernelsSpec extends SparkSpec {
  import spark.implicits._

  // 4 centroids x 4 dims, ids deliberately out of order; the last is a
  // duplicate of the first so the cid tie-break is exercised
  private val cvs: Seq[Seq[Double]] = Seq(
    Seq(1.0, 0.0, 0.0, 0.0), Seq(0.0, 1.0, 0.5, 0.25),
    Seq(-1.0, 2.0, 0.0, 1.0), Seq(1.0, 0.0, 0.0, 0.0))
  private val cids: Seq[Long] = Seq(7L, 3L, 9L, 2L)
  private val cnrms: Seq[Double] =
    cvs.map(v => math.sqrt(v.map(x => x * x).sum))

  /** The r11 RDD lane's exact rule: sortBy((-score, cid)).take(n). */
  private def reference(v: Array[Double], take: Int): (Double, Seq[Long]) = {
    var n2 = 0.0
    v.foreach(x => n2 += x * x)
    val nrm = math.sqrt(n2)
    val ranked = cvs.indices.map { c =>
      var acc = 0.0
      v.indices.foreach(i => acc += v(i) * cvs(c)(i))
      (acc / (nrm * cnrms(c)), cids(c))
    }.sortBy { case (s, cid) => (-s, cid) }.take(take).map(_._2)
    (nrm, ranked)
  }

  private def run(vecs: Seq[Array[Double]], take: Int)
      : Seq[(Long, Double, Seq[Long])] = {
    IvfKernels.register(spark)
    vecs.zipWithIndex
      .map { case (v, i) => (i.toLong, v.map(_.toFloat).toSeq) }
      .toDF("id", "v")
      .select(col("id"),
        call_function("ivf_assign", col("v"), lit(take),
          typedLit(cvs), typedLit(cids), typedLit(cnrms)).as("a"))
      .select(col("id"), col("a.nrm"), col("a.cids"))
      .as[(Long, Double, Seq[Long])].collect().sortBy(_._1).toSeq
  }

  test("ivf_assign matches the RDD-lane reference incl. ties and rank order") {
    val vecs = Seq(
      Array(0.9, 0.1, -0.3, 0.4),
      Array(-1.0, 2.0, 0.0, 1.0),
      Array(1.0, 0.0, 0.0, 0.0)) // exact tie between cids 7 and 2
    for (take <- Seq(1, 2, 4)) {
      val got = run(vecs, take)
      got.foreach { case (i, nrm, out) =>
        // floats promoted to double — mirror in the reference input
        val (rNrm, rIds) = reference(
          vecs(i.toInt).map(x => x.toFloat.toDouble), take)
        assert(nrm == rNrm, s"take=$take vec=$i norm")
        assert(out == rIds, s"take=$take vec=$i")
      }
    }
  }

  test("ivf_assign ranks a zero-norm (all-NaN-score) row by centroid id") {
    // old lane: sortBy ascending on -score puts NaN last, so an all-NaN
    // row ties every centroid and falls back to cid ASC
    val got = run(Seq(Array(0.0, 0.0, 0.0, 0.0)), 2)
    assert(got.head._2 == 0.0)
    assert(got.head._3 == Seq(2L, 3L))
  }

  test("ivf_assign take caps at the centroid count and propagates null") {
    IvfKernels.register(spark)
    val df = Seq((1L, Option(Seq(1.0f, 0.0f, 0.0f, 0.0f))),
      (2L, Option.empty[Seq[Float]])).toDF("id", "v")
    val out = df.select(col("id"),
        call_function("ivf_assign", col("v"), lit(99),
          typedLit(cvs), typedLit(cids), typedLit(cnrms)).as("a"))
      .collect().sortBy(_.getLong(0))
    assert(out(0).getStruct(1).getSeq[Long](1).length == 4)
    assert(out(1).isNullAt(1))
  }

  test("ivf_assign matches the reference on randomized vectors/centroids") {
    val rnd = new scala.util.Random(20260815L)
    (1 to 5).foreach { trial =>
      val k = 3 + rnd.nextInt(4)
      val d = 4 * (1 + rnd.nextInt(2))
      val fCvs = Seq.fill(k)(Seq.fill(d)(
        math.rint(rnd.nextDouble() * 200 - 100) / 100.0))
      val fIds = rnd.shuffle((1L to k.toLong).toList).toSeq
      val fNrms = fCvs.map(v => math.sqrt(v.map(x => x * x).sum))
      def ref(v: Array[Double], take: Int): Seq[Long] =
        fCvs.indices.map { c =>
          var acc = 0.0
          v.indices.foreach(i => acc += v(i) * fCvs(c)(i))
          (acc / (math.sqrt(v.map(x => x * x).sum) * fNrms(c)), fIds(c))
        }.sortBy { case (s, cid) => (-s, cid) }.take(take).map(_._2)
      val vecs = Seq.fill(8)(Array.fill(d)(
        (rnd.nextFloat() * 2 - 1).toDouble))
      val take = 1 + rnd.nextInt(k)
      IvfKernels.register(spark)
      val got = vecs.zipWithIndex
        .map { case (v, i) => (i.toLong, v.map(_.toFloat).toSeq) }
        .toDF("id", "v")
        .select(col("id"),
          call_function("ivf_assign", col("v"), lit(take),
            typedLit(fCvs), typedLit(fIds), typedLit(fNrms)).as("a"))
        .select(col("id"), col("a.cids"))
        .as[(Long, Seq[Long])].collect().sortBy(_._1)
      got.foreach { case (i, out) =>
        val vf = vecs(i.toInt).map(x => x.toFloat.toDouble)
        assert(out == ref(vf, take), s"trial=$trial vec=$i take=$take")
      }
    }
  }

  test("pq_encode survives non-finite scores (zero-norm div) unchanged") {
    // ADVICE r11: BigDecimal.valueOf(NaN/Inf) threw; Spark's round
    // returns non-finite unchanged, so a div=0 (zero-norm) row must
    // produce codes, not crash the job. +Inf ties all centroids of a
    // positive-dot subspace -> lowest cid wins.
    graft.functions.PqKernels.register(spark)
    val cvs2: Seq[Seq[Seq[Double]]] =
      Seq(Seq(Seq(1.0, 1.0), Seq(2.0, 2.0)))
    val cids2: Seq[Seq[Long]] = Seq(Seq(5L, 4L))
    val out = Seq((1L, Seq(1.0f, 1.0f))).toDF("id", "v")
      .select(call_function("pq_encode", col("v"), lit(0.0),
        typedLit(cvs2), typedLit(cids2)).as("codes"))
      .as[Seq[Long]].collect().head
    assert(out == Seq(4L)) // both dots +Inf after /0 -> cid tie-break
  }
}
