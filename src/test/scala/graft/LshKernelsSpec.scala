package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Bit-exactness of the native sign-LSH kernels vs the unrolled
  * expression forms they replaced (VERDICT r14 #3 port) — the same
  * parity discipline as PqKernelsSpec/IvfKernelsSpec: the kernel may
  * only change the generated source, never a value.
  */
class LshKernelsSpec extends SparkSpec {

  private lazy val emb = Tables.load(spark, sfDir, "embeddings")

  private def unrolledNrm(dim: Int) =
    sqrt((1 to dim).map(i =>
      element_at(col("embedding"), i).cast("double") *
        element_at(col("embedding"), i).cast("double")).reduceLeft(_ + _))

  private def unrolledBucket(bits: Int) =
    (0 until bits).map { i =>
      when(element_at(col("embedding"), i + 1) > 0f, lit(1L << i))
        .otherwise(lit(0L))
    }.reduce(_ + _)

  test("vec_nrm is bit-identical to the unrolled sqrt-of-dot") {
    val d = Similarity.dimOf(emb)
    val rows = emb.select(
        Similarity.normN(col("embedding"), d).as("k"),
        unrolledNrm(d).as("u"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("sign_bucket is identical to the unrolled conditional sum") {
    Seq(1, 7, 16).foreach { bits =>
      val rows = emb.select(
          Similarity.signBucket(col("embedding"), bits).as("k"),
          unrolledBucket(bits).as("u"))
        .collect()
      assert(rows.nonEmpty)
      rows.foreach(r => assert(r.getLong(0) == r.getLong(1),
        s"bits=$bits: ${r.getLong(0)} != ${r.getLong(1)}"))
    }
  }

  test("sign_bucket offset form equals the unrolled band slice") {
    graft.functions.LshKernels.register(spark)
    Seq((0, 8), (8, 8), (24, 7)).foreach { case (off, bits) =>
      val unrolled = (0 until bits).map { i =>
        when(element_at(col("embedding"), off + i + 1) > 0f, lit(1L << i))
          .otherwise(lit(0L))
      }.reduce(_ + _)
      val rows = emb.select(
          call_function("sign_bucket", col("embedding"), lit(off),
            lit(bits)).as("k"),
          unrolled.as("u"))
        .collect()
      assert(rows.nonEmpty)
      rows.foreach(r => assert(r.getLong(0) == r.getLong(1),
        s"off=$off bits=$bits: ${r.getLong(0)} != ${r.getLong(1)}"))
    }
  }

  test("null-cell semantics match the unrolled forms") {
    import spark.implicits._
    val df = Seq(
        (1L, Seq[java.lang.Float](1.0f, null, -2.0f)),
        (2L, Seq[java.lang.Float](0.5f, -0.25f, 2.0f)))
      .toDF("vec_id", "embedding")
    val got = df.select(col("vec_id"),
        Similarity.normN(col("embedding"), 3).as("nrm"),
        Similarity.signBucket(col("embedding"), 3).as("b"))
      .collect().map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) None else Some(r.getDouble(1))), r.getLong(2)))
      .toMap
    // null cell -> null norm (element_at propagation), bucket bit 0
    assert(got(1L)._1.isEmpty)
    assert(got(1L)._2 == 1L) // only dim 0 positive; null mid-cell adds 0
    assert(got(2L)._1.exists(n => math.abs(n - math.sqrt(4.3125)) < 1e-12))
    assert(got(2L)._2 == (1L | 4L))
    // an embedding SHORTER than the requested width throws loudly (the
    // ANSI element_at contract), never a silent partial read
    val short = Seq((1L, Seq(1.0f))).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      short.select(Similarity.normN(col("embedding"), 3)).collect()
    }
    assert(e.getMessage != null)
  }

  test("null ARRAY buckets to 0L on both kernel and fallback (ADVICE r15)") {
    import spark.implicits._
    val df = Seq((1L, null: Seq[java.lang.Float]),
        (2L, Seq[java.lang.Float](1.0f, -1.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    // kernel path (active session): null array -> 0L, NOT null — a
    // null band key would drop null-embedding rows from every LSH
    // equijoin while the legacy unrolled form clustered them in
    // bucket 0; the two paths must give the same candidate sets
    val kernel = df.select(col("vec_id"),
        Similarity.signBucket(col("embedding"), 3).as("b"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(kernel(1L).contains(0L),
      s"kernel must bucket a null array to 0L, got ${kernel(1L)}")
    assert(kernel(2L).contains(1L | 4L))
    // the unrolled no-active-session fallback shape, built explicitly
    val fallback = df.select(col("vec_id"),
        (0 until 3).map { i =>
          when(element_at(col("embedding"), i + 1) > 0f, lit(1L << i))
            .otherwise(lit(0L))
        }.reduce(_ + _).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fallback == kernel.map { case (k, v) => k -> v.get })
  }

  test("non-foldable width args fail with the intended message (ADVICE r15)") {
    graft.functions.LshKernels.register(spark)
    val df = spark.range(1).select(
      array(lit(1.0f)).as("embedding"), lit(1).as("w"))
    val e = intercept[Exception] {
      df.select(call_function("sign_bucket", col("embedding"), col("w")))
        .collect()
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(chain(e).exists(_.contains("must be an integer literal")),
      s"wanted the analysis-time message, got: ${chain(e).mkString(" | ")}")
  }
}
