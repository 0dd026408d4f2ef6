package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("hits authorities match the hand-computed integer rounds") {
    // c1->s1 (w=2), c1->s2, c2->s2:
    //   a0: s1=1 s2=1; h1: c1=3 c2=1; a1: s1=6 s2=4;
    //   h2: c1=16 c2=4; a2: s1=32 s2=20
    val edges = Seq((1L, 10L), (1L, 10L), (1L, 20L), (2L, 20L))
      .toDF("cust", "supp")
    val out = Graph.hitsAuthorities(edges, "cust", "supp", rounds = 2, k = 10)
      .collect()
    assert(out.map(r => (r.getAs[Long]("node"),
      r.getAs[Long]("auth_score"), r.getAs[Int]("rank"))).toSeq ==
      Seq((10L, 32L, 1), (20L, 20L, 2)))
  }

  test("hits overflow guard fails loudly past the strength cap") {
    // rounds=4 caps node strength at ~17; one hub of strength 40 trips
    // the assert_true guard instead of wrapping silently.
    val edges = (1 to 40).map(i => (1L, (i % 4).toLong)).toDF("cust", "supp")
    val ex = intercept[Exception] {
      Graph.hitsAuthorities(edges, "cust", "supp", rounds = 4).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("overflow") ||
      ex.getCause != null &&
        ex.getCause.getMessage.toLowerCase.contains("overflow"))
  }
}
