package graft

import graft.operators.StoreLease
import java.nio.file.Files

/** Lease-mechanism contracts beyond CliSpec's store-level rows: the
  * crashed-mid-write lease (empty file) refuses loudly until stale
  * instead of being treated as absent, reentrancy acquires once and
  * releases once, and a failing body still releases.
  */
class StoreLeaseSpec extends SparkSpec {

  test("reentrant acquisition takes ONE lease and releases it exactly at the outermost exit") {
    val base = Files.createTempDirectory("graft_lease_re").toString
    val fs = new org.apache.hadoop.fs.Path(base).getFileSystem(
      spark.sessionState.newHadoopConf())
    val lease = new org.apache.hadoop.fs.Path(base, StoreLease.LeaseName)
    val n = StoreLease.withLease(spark, base, "outer") {
      assert(fs.exists(lease), "outer acquisition must hold the file")
      StoreLease.withLease(spark, base, "inner") {
        assert(fs.exists(lease), "nested acquisition rides the outer lease")
        StoreLease.holder(spark, base).map(_._2).getOrElse("")
      }
    }
    // the inner block saw the OUTER acquisition's op — one lease, not two
    assert(n == "outer")
    assert(!fs.exists(lease), "lease must release at the outermost exit")
  }

  test("a failing body releases the lease; an empty (crashed-mid-write) lease refuses until stale") {
    val base = Files.createTempDirectory("graft_lease_err").toString
    val fs = new org.apache.hadoop.fs.Path(base).getFileSystem(
      spark.sessionState.newHadoopConf())
    val lease = new org.apache.hadoop.fs.Path(base, StoreLease.LeaseName)
    intercept[RuntimeException] {
      StoreLease.withLease(spark, base, "boom") {
        assert(fs.exists(lease))
        throw new RuntimeException("boom")
      }
    }
    assert(!fs.exists(lease), "a throwing body must still release")
    // crashed mid-write: the file exists but carries no holder id. That
    // is NOT absence — a writer may be mid-create — so a fresh empty
    // lease refuses (loud, recoverable) rather than being stolen...
    fs.create(lease, true).close()
    val e = intercept[IllegalStateException] {
      StoreLease.withLease(spark, base, "steal") { fail("must not run") }
    }
    assert(e.getMessage.contains("is being mutated"), e.getMessage)
    // ...and reclaims once stale, like any crashed holder
    fs.setTimes(lease, System.currentTimeMillis() -
      StoreLease.StaleMillis - 60000L, -1)
    val ran = StoreLease.withLease(spark, base, "after-stale") { 42 }
    assert(ran == 42 && !fs.exists(lease))
  }
}
