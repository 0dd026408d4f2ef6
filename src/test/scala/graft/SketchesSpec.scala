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
}
