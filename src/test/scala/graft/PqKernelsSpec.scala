package graft

import graft.functions.PqKernels
import org.apache.spark.sql.functions._

/** Expression-level contract tests for the native PQ encode kernels —
  * the end-to-end gate proves oracle parity; these pin the kernel's own
  * semantics (argmax rule, rounding, element types, null propagation)
  * against an independent in-test reference so a kernel edit can't
  * drift inside a still-green pipeline.
  */
class PqKernelsSpec extends SparkSpec {
  import spark.implicits._

  private def r6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  // 2 subspaces x 3 centroids x 4 dims, ids deliberately out of order
  private val cvs: Seq[Seq[Seq[Double]]] = Seq(
    Seq(Seq(1.0, 0.0, 0.0, 0.0), Seq(0.0, 1.0, 0.5, 0.25),
      Seq(-1.0, 2.0, 0.0, 1.0)),
    Seq(Seq(0.5, 0.5, 0.5, 0.5), Seq(2.0, -1.0, 0.0, 0.0),
      Seq(0.0, 0.0, 0.0, 1.0)))
  private val cids: Seq[Seq[Long]] = Seq(Seq(7L, 3L, 9L), Seq(2L, 8L, 5L))

  private def reference(v: Array[Double], div: Double): Seq[Long] =
    (0 to 1).map { s =>
      val scored = cvs(s).zip(cids(s)).map { case (cv, cid) =>
        var acc = 0.0
        (0 until 4).foreach(i => acc += v(s * 4 + i) * cv(i))
        (r6(if (div.isNaN) acc else acc / div), cid)
      }
      // argmax by (sd DESC, cid ASC) under Double.compare ordering
      scored.minBy { case (sd, cid) => (-sd, cid) }._2
    }

  test("pq_encode matches an independent reference on float and double vectors") {
    PqKernels.register(spark)
    val vecs = Seq(
      Array(0.9, 0.1, -0.3, 0.4, 0.2, 0.2, 0.2, 0.2),
      Array(-1.0, 2.0, 0.0, 1.0, 2.0, -1.0, 0.0, 0.0),
      Array(0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0))
    val fdf = vecs.zipWithIndex
      .map { case (v, i) => (i.toLong, v.map(_.toFloat).toSeq) }
      .toDF("id", "v")
    val ddf = vecs.zipWithIndex
      .map { case (v, i) => (i.toLong, v.toSeq) }
      .toDF("id", "v")
    for ((df, label) <- Seq((fdf, "float"), (ddf, "double"));
         div <- Seq(Double.NaN, 2.0)) {
      val got = df.select(col("id"),
          call_function("pq_encode", col("v"), lit(div),
            typedLit(cvs), typedLit(cids)).as("codes"))
        .as[(Long, Seq[Long])].collect().sortBy(_._1)
      got.foreach { case (i, codes) =>
        assert(codes == reference(vecs(i.toInt), div),
          s"$label div=$div vec=$i")
      }
    }
  }

  test("pq_encode propagates null inputs as null") {
    PqKernels.register(spark)
    val df = Seq((1L, Option(Seq(1.0f, 2.0f, 3.0f, 4.0f, 1f, 1f, 1f, 1f))),
      (2L, Option.empty[Seq[Float]])).toDF("id", "v")
    val out = df.select(col("id"),
        call_function("pq_encode", col("v"), lit(1.0),
          typedLit(cvs), typedLit(cids)).as("codes"))
      .collect().sortBy(_.getLong(0))
    assert(!out(0).isNullAt(1))
    assert(out(1).isNullAt(1))
  }

  test("pq_encode matches the reference on randomized vectors and codebooks") {
    // Seeded fuzz over the argmax/round6/tie-break surface: random
    // codebooks (including DUPLICATE centroid vectors, which force the
    // cid tie-break) and random float vectors, against the same
    // independent reference as the fixed cases.
    PqKernels.register(spark)
    val rnd = new scala.util.Random(20260814L)
    (1 to 5).foreach { trial =>
      val fuzzCvs: Seq[Seq[Seq[Double]]] = Seq.fill(2)({
        val base = Seq.fill(3)(Seq.fill(4)(
          math.rint(rnd.nextDouble() * 200 - 100) / 100.0))
        base :+ base.head // duplicate forces (sd tie, cid) ordering
      })
      val fuzzIds: Seq[Seq[Long]] =
        Seq.fill(2)(rnd.shuffle((1L to 4L).toList).toSeq)
      def ref(v: Array[Double], div: Double): Seq[Long] =
        (0 to 1).map { s =>
          fuzzCvs(s).zip(fuzzIds(s)).map { case (cv, cid) =>
            var acc = 0.0
            (0 until 4).foreach(i => acc += v(s * 4 + i) * cv(i))
            (r6(if (div.isNaN) acc else acc / div), cid)
          }.minBy { case (sd, cid) => (-sd, cid) }._2
        }
      val vecs = Seq.fill(8)(Array.fill(8)(
        (rnd.nextFloat() * 2 - 1).toDouble))
      val df = vecs.zipWithIndex
        .map { case (v, i) => (i.toLong, v.map(_.toFloat).toSeq) }
        .toDF("id", "v")
      val div = if (trial % 2 == 0) Double.NaN else 1.5
      val got = df.select(col("id"),
          call_function("pq_encode", col("v"), lit(div),
            typedLit(fuzzCvs), typedLit(fuzzIds)).as("codes"))
        .as[(Long, Seq[Long])].collect().sortBy(_._1)
      got.foreach { case (i, codes) =>
        // the kernel sees FLOATS promoted to double; mirror that in
        // the reference input
        val vf = vecs(i.toInt).map(x => x.toFloat.toDouble)
        assert(codes == ref(vf, div), s"trial=$trial vec=$i div=$div")
      }
    }
  }

  test("pq_encode_res equals pq_encode on explicitly residualized input") {
    PqKernels.register(spark)
    val coarseIds = Seq(4L, 6L)
    val coarseVs = Seq(
      Seq(0.1, 0.1, 0.1, 0.1, 0.2, 0.2, 0.2, 0.2),
      Seq(-0.1, 0.0, 0.3, 0.0, 0.0, 0.1, 0.0, 0.4))
    val v = Array(0.9, 0.1, -0.3, 0.4, 0.2, 0.7, 0.2, 0.2)
    val nrm = math.sqrt(v.map(x => x * x).sum)
    val ccid = 6L
    val cv = coarseVs(1)
    val residual = v.indices.map(i => v(i) / nrm - cv(i))
    val df = Seq((1L, v.toSeq, nrm, ccid)).toDF("id", "v", "nrm", "ccid")
    val viaRes = df.select(
        call_function("pq_encode_res", col("v"), col("nrm"), col("ccid"),
          typedLit(coarseIds), typedLit(coarseVs),
          typedLit(cvs), typedLit(cids)).as("codes"))
      .as[Seq[Long]].collect().head
    val direct = Seq((1L, residual)).toDF("id", "v")
      .select(call_function("pq_encode", col("v"), lit(Double.NaN),
        typedLit(cvs), typedLit(cids)).as("codes"))
      .as[Seq[Long]].collect().head
    assert(viaRes == direct)
  }
}
