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

  test("pagerank matches the hand-computed fixed-point rounds") {
    // 1->2, 2->1, 2->3, 3->1; deg 1:1 2:2 3:1.
    //   r1: n1 = 150000+425000+850000, n2 = 150000+850000,
    //       n3 = 150000+425000
    //   r2: n1 = 150000+425000+488750, n2 = 150000+1211250,
    //       n3 = 150000+425000
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L))
      .toDF("src", "dst")
    val out = Graph.pagerankTopK(edges, "src", "dst", rounds = 2, k = 10)
      .collect()
    assert(out.map(r => (r.getAs[Long]("node"),
      r.getAs[Long]("pr_score"), r.getAs[Int]("rank"))).toSeq ==
      Seq((2L, 1361250L, 1), (1L, 1063750L, 2), (3L, 575000L, 3)))
  }

  test("pagerank conserves mass within the damping budget") {
    // Sum of scores never exceeds n*1e6 (the overflow bound's invariant):
    // base injects 0.15e6 per node, inflow retains <= 0.85 of prior mass.
    val edges = (1 to 200).map(i => (i.toLong, ((i * 7) % 200 + 1).toLong))
      .toDF("src", "dst")
    val both = edges.unionByName(edges.toDF("dst", "src").select(
      col("dst").as("src"), col("src").as("dst")))
    val total = Graph.pagerankTopK(both, "src", "dst", rounds = 4, k = 1000)
      .agg(sum("pr_score")).collect()(0).getLong(0)
    assert(total <= 200L * 1000000L)
  }

  test("bfs frontiers expand by hop and never recount visited nodes") {
    // path graph 1-2-3-4 (bidirectional), seed {1}:
    //   hop0 {1}, hop1 {2}, hop2 {3}, hop3 {4}
    val e0 = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val edges = e0.unionByName(e0.select(col("dst").as("src"),
      col("src").as("dst")))
    val seeds = Seq(1L).toDF("node")
    val out = Graph.bfsFrontiers(edges, "src", "dst", seeds, "node", 3)
      .collect().map(r => (r.getAs[Int]("hop"),
        r.getAs[Long]("frontier_size"), r.getAs[Long]("reached_total")))
      .toSeq
    assert(out == Seq((0, 1L, 1L), (1, 1L, 2L), (2, 1L, 3L), (3, 1L, 4L)))
  }

  test("triangle census counts the hand-built graph exactly once each") {
    // K4 on {1,2,3,4} (4 triangles... C(4,3)=4) plus a pendant 4-5 and a
    // disconnected edge 6-7. Edges given as messy multi/directed input:
    // duplicates, reversed orientation, and a self-loop all normalize
    // away. n=7 nodes, m=8 edges, wedges: deg(1..3)=3, deg(4)=4,
    // deg(5)=1, deg(6)=deg(7)=1 -> 3*3 + 6 + 0 = 15, triangles = 4.
    val edges = Seq(
      (1L, 2L), (2L, 1L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 3L), (4L, 5L), (6L, 7L), (5L, 5L))
      .toDF("a", "b")
    val out = Graph.triangleStats(edges, "a", "b").collect().head
    assert((out.getAs[Long]("n_nodes"), out.getAs[Long]("n_edges"),
      out.getAs[Long]("n_wedges"), out.getAs[Long]("n_triangles")) ==
      ((7L, 8L, 15L, 4L)))
  }

  test("kcore peel cascades: pendant removal drops a once-core node") {
    // Triangle {1,2,3} + path 3-4-5. k=2, round 1: nodes 4's neighbor 5
    // (deg 1) and... deg(5)=1 drops 5 and edge 4-5; round 2: 4 now has
    // deg 1, drops too; round 3: stable triangle. The cascade is the
    // point — 4 survives round 1 but not round 2.
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L))
      .toDF("a", "b")
    val out = Graph.kcoreTrace(edges, "a", "b", k = 2, rounds = 3)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq((0, 5L, 5L), (1, 4L, 4L), (2, 3L, 3L), (3, 3L, 3L)))
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
