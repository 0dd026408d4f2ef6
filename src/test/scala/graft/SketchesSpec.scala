package graft

import graft.operators.Sketches
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("hll estimate lands within 4 sigma of exact across cardinalities") {
    // sigma ~= 1.04/sqrt(256) ~= 6.5% for the bias-corrected branch;
    // the small-range linear-counting branch is tighter.
    val df = (1 to 20000).map(i => (s"g${i % 3}", (i % (100 * (1 + i % 3)))))
      .toDF("grp", "k")
    val out = Sketches.hllDistinct(df, "k", "grp").collect()
    assert(out.length == 3)
    out.foreach { r =>
      val exact = r.getAs[Long]("exact_distinct").toDouble
      val est = r.getAs[Double]("hll_estimate")
      assert(math.abs(est - exact) / exact < 0.26,
        s"${r.getString(0)}: est $est vs exact $exact")
    }
  }

  test("hll registers merge by max: union estimate equals whole-set estimate") {
    // Sketch additivity — the property that makes HLL a SKETCH rather
    // than a sample: sketch(A ∪ B) from merged registers must equal the
    // directly-built sketch. Here both halves run through the same
    // operator under one group vs two groups re-unioned.
    val a = (1 to 5000).map(i => ("u", i)).toDF("grp", "k")
    val b = (2501 to 7500).map(i => ("u", i)).toDF("grp", "k")
    val whole = Sketches.hllDistinct(a.union(b), "k", "grp")
      .collect()(0).getAs[Double]("hll_estimate")
    // same rows arriving in different partition/order — estimate is
    // order-independent because registers are maxes
    val reordered = Sketches.hllDistinct(
      b.union(a).repartition(7), "k", "grp")
      .collect()(0).getAs[Double]("hll_estimate")
    assert(whole == reordered)
  }

  test("streaming HLL equals the batch estimate bit for bit after each prefix") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(String, Long)]
    val q = graft.streaming.StreamingSketches
      .hllEstimates(mem.toDF().toDF("event_type", "user_id"),
        "user_id", "event_type")
      .writeStream.format("memory").queryName("hll_stream")
      .outputMode(graft.streaming.StreamingSketches.outputMode).start()
    try {
      val chunk1 = (1 to 2000).map(i => ("a", i.toLong))
      val chunk2 = (1500 to 4000).map(i => ("a", i.toLong)) // overlap replays
      def batchEst(rows: Seq[(String, Long)]): Double =
        operators.Sketches.hllDistinct(
          rows.toDF("event_type", "user_id"), "user_id", "event_type")
          .collect()(0).getAs[Double]("hll_estimate")
      mem.addData(chunk1: _*)
      q.processAllAvailable()
      // Update-mode memory sink appends one row per trigger for the single
      // group; the last row is the latest prefix's estimate.
      val got1 = spark.table("hll_stream").collect().last.getAs[Double]("hll_estimate")
      assert(got1 == batchEst(chunk1))
      mem.addData(chunk2: _*)
      q.processAllAvailable()
      val got2 = spark.table("hll_stream").collect().last.getAs[Double]("hll_estimate")
      assert(got2 == batchEst(chunk1 ++ chunk2))
    } finally q.stop()
  }

  test("hll overlap: inclusion-exclusion intersection near exact, clamped at 0") {
    // A = 1..6000, B = 4001..10000 — exact intersection 2000. The
    // estimate differences compound three register-level errors, so the
    // tolerance is generous; the input is deterministic (md5 registers),
    // so a pass here is a pass always.
    val rows = ((1 to 6000).map(i => ("A", i)) ++
      (4001 to 10000).map(i => ("B", i))).toDF("tag", "k")
    val r = Sketches.hllOverlap(rows, "k", col("tag")).collect()(0)
    assert(r.getAs[Long]("exact_inter") == 2000L)
    assert(math.abs(r.getAs[Double]("est_inter") - 2000.0) / 2000.0 < 0.5)
    // disjoint populations: the difference of noisy estimates may be
    // negative; the operator must clamp, never report a negative overlap
    val dj = ((1 to 3000).map(i => ("A", i)) ++
      (100001 to 103000).map(i => ("B", i))).toDF("tag", "k")
    val r2 = Sketches.hllOverlap(dj, "k", col("tag")).collect()(0)
    assert(r2.getAs[Long]("exact_inter") == 0L)
    assert(r2.getAs[Double]("est_inter") >= 0.0)
  }

  test("cms estimate is one-sided: >= exact for EVERY key, not just heavy ones") {
    // 700 keys in 4x1024 counters — collisions are certain, undercounts
    // are impossible: min-over-depths can only carry the key's own mass
    // plus colliding mass.
    val df = (1 to 20000).map(i => i % 700).toDF("k")
    val out = Sketches.cmsHeavyHitters(df, "k", k = 700).collect()
    assert(out.length == 700)
    out.foreach { r =>
      assert(r.getAs[Long]("cms_estimate") >= r.getAs[Long]("exact_cnt"),
        s"undercount at k=${r.get(0)}")
      assert(r.getAs[Long]("over_permille") >= 0L)
    }
  }

  test("cms JVM cells match the relational derivation for the same key") {
    // cmsCellsOf (streaming face) and the Column-side md5 salt must land
    // every key in the same cells, or batch/stream parity is fiction.
    val rel = Sketches.cmsRelation(Seq("149").toDF("k"), "k", lit("g"))
      .orderBy("depth").select("depth", "bucket").collect()
      .map(r => (r.getAs[Int]("depth"), r.getAs[Long]("bucket").toInt))
    val jvm = Sketches.cmsCellsOf("149").zipWithIndex.map(_.swap)
    assert(rel.toSeq == jvm.toSeq)
  }

  test("streaming CMS point estimates equal the batch fold after each prefix") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val probes = Seq("7", "13", "absent")
    val mem = MemoryStream[(String, String)]
    val q = graft.streaming.StreamingSketches
      .cmsPointEstimates(mem.toDF().toDF("event_type", "user_id"),
        "user_id", "event_type", probes)
      .writeStream.format("memory").queryName("cms_stream")
      .outputMode(graft.streaming.StreamingSketches.outputMode).start()
    try {
      val w = Sketches.CmsW.toInt
      def fold(rows: Seq[String]): Map[String, Long] = {
        val cells = new Array[Long](Sketches.CmsD * w)
        rows.foreach { k =>
          Sketches.cmsCellsOf(k).zipWithIndex
            .foreach { case (b, d) => cells(d * w + b) += 1L }
        }
        probes.map { p =>
          p -> Sketches.cmsCellsOf(p).zipWithIndex
            .map { case (b, d) => cells(d * w + b) }.min
        }.toMap
      }
      def lastEsts(): Map[String, Long] =
        spark.table("cms_stream").collect().takeRight(probes.size)
          .map(r => r.getAs[String]("probe_key") ->
            r.getAs[Long]("cms_estimate")).toMap
      val chunk1 = (1 to 2000).map(i => ("a", (i % 50).toString))
      mem.addData(chunk1: _*)
      q.processAllAvailable()
      assert(lastEsts() == fold(chunk1.map(_._2)))
      val chunk2 = (1 to 1500).map(i => ("a", (i % 90).toString))
      mem.addData(chunk2: _*)
      q.processAllAvailable()
      assert(lastEsts() == fold((chunk1 ++ chunk2).map(_._2)))
    } finally q.stop()
  }

  test("cms counters merge by sum: per-group rollup equals the direct sketch") {
    // The additive-merge property that licenses shard/day-wise sketching
    // with late rollup — bucket-wise sums of per-group counters must be
    // indistinguishable from a single global pass.
    val df = (1 to 15000).map(i => (s"g${i % 5}", i % 400)).toDF("grp", "k")
    val direct = Sketches.cmsRelation(df, "k", lit("__ALL__"))
      .select("depth", "bucket", "cnt").collect().toSet
    val merged = Sketches.cmsRelation(df, "k", col("grp"))
      .groupBy("depth", "bucket").agg(sum("cnt").as("cnt"))
      .select("depth", "bucket", "cnt").collect().toSet
    assert(direct == merged)
  }
}
