package graft

import graft.operators.BloomPrune
import org.apache.spark.sql.functions._

class BloomPruneSpec extends SparkSpec {
  import spark.implicits._

  test("bloom filter has no false negatives and the pruned join is exact") {
    val build = (1L to 100L).toDF("bk")
    val probe = (1L to 10000L).toDF("pk")
    val bm = BloomPrune.buildBitmap(build, "bk")
    val kept = BloomPrune.applyFilter(probe, "pk", bm, 1 << 17)
      .select("pk").as[Long].collect().toSet
    // every build key survives the filter — Bloom guarantees no false negs
    assert((1L to 100L).forall(kept.contains))
    // at m=128Ki bits / n=100 keys / k=3 the expected false-positive count
    // over 9900 probes is << 1; allow a loose margin, the point is that
    // pruning actually prunes
    assert(kept.size <= 110, s"pruned set unexpectedly large: ${kept.size}")
    // end-to-end: pruned join == plain join, row for row
    val joined = BloomPrune.prunedJoin(probe, build, "pk", "bk")
      .select("pk").as[Long].collect().sorted.toSeq
    assert(joined == (1L to 100L).toSeq)
  }

  test("null probe keys are dropped, not crashed on") {
    val build = Seq(1L, 2L).toDF("bk")
    val probe = Seq[Option[Long]](Some(1L), None, Some(3L)).toDF("pk")
    val bm = BloomPrune.buildBitmap(build, "bk")
    val kept = BloomPrune.applyFilter(probe, "pk", bm, 1 << 17)
      .select("pk").as[Long].collect().toSeq
    assert(kept == Seq(1L))
  }
}
