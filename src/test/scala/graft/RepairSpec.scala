package graft

import graft.operators._
import org.apache.spark.sql.functions._

class RepairSpec extends SparkSpec {

  private lazy val orders = Tables.load(spark, sfDir, "orders")
  private val spec = TableDiff.DiffSpec(
    pkCols = Seq("o_orderkey"), chunkBy = "o_orderkey", chunkWidth = 500)

  test("applying the diff repairs downstream to equal upstream (export-fix-sql round trip)") {
    val down = Perturb.ordersDownstream(orders)
    val rd = TableDiff.rowDiff(orders, down, spec)
    assert(!rd.isEmpty) // the drift is real before repair
    val repaired = Repair.repair(down, orders, rd, spec.pkCols)
    assert(TableDiff.rowDiff(orders, repaired, spec).isEmpty)
    assert(HashDiff.diff(orders, repaired).isEmpty) // full-row multiset equality
  }

  test("repair is a no-op on an empty diff") {
    val rd = TableDiff.rowDiff(orders, orders, spec)
    val repaired = Repair.repair(orders, orders, rd, spec.pkCols)
    assert(repaired.count() == orders.count())
    assert(HashDiff.diff(orders, repaired).isEmpty)
  }
}

class StreamingDualDiffSpec extends SparkSpec {
  import spark.implicits._
  import graft.streaming.StreamingDiff
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
  import java.sql.Timestamp

  private def ts(min: Int) = new Timestamp(1704067200000L + min * 60000L)

  private val up = Seq(
    Ev(1, ts(0), 10, "click", 1.5),
    Ev(2, ts(10), 11, "click", 2.5),
    Ev(3, ts(70), 10, "error", 3.5))

  // drift: event 2 value mutated, event 3 missing, event 4 extra
  private val down = Seq(
    Ev(1, ts(0), 10, "click", 1.5),
    Ev(2, ts(10), 11, "click", 9.9),
    Ev(4, ts(75), 12, "click", 4.5))

  test("dual-stream windowed diff flags exactly the drifted windows") {
    implicit val sc = spark.sqlContext
    val memUp = MemoryStream[Ev]
    val memDown = MemoryStream[Ev]
    val q = StreamingDiff.windowedDiff(
      memUp.toDF(), memDown.toDF(), "1 hour", watermark = Some("10 minutes"))
      .writeStream.format("memory").queryName("dual_diff")
      .outputMode("complete").start()
    try {
      memUp.addData(up: _*)
      memDown.addData(down: _*)
      q.processAllAvailable()
      val got = spark.table("dual_diff")
        .select("window_start", "event_type", "up_cnt", "down_cnt")
        .as[(Timestamp, String, Long, Long)].collect().toSet
      // hour 0 'click': counts equal (2=2) but checksums differ (mutation);
      // hour 1 'error': missing on down; hour 1 'click': extra on down
      assert(got == Set(
        (ts(0), "click", 2L, 2L),
        (ts(60), "error", 1L, 0L),
        (ts(60), "click", 0L, 1L)))
    } finally q.stop()
  }

  test("batch inputs yield the final bad-window relation directly") {
    val bad = StreamingDiff.windowedDiff(up.toDF(), down.toDF(), "1 hour")
    assert(bad.count() == 3)
    // identical inputs -> empty
    assert(StreamingDiff.windowedDiff(up.toDF(), up.toDF(), "1 hour").isEmpty)
  }
}
