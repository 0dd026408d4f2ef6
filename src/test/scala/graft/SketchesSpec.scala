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
}
