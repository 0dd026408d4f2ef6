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

  private def withStale[T](ms: Long)(body: => T): T = {
    sys.props("graft.lease.staleMillis") = ms.toString
    try body finally sys.props.remove("graft.lease.staleMillis")
  }

  test("heartbeat: a body outliving staleMillis keeps a FRESH lease, so an age-only (cross-host) reclaimer never fires") {
    withStale(600L) {
      val base = Files.createTempDirectory("graft_lease_hb").toString
      val fs = new org.apache.hadoop.fs.Path(base).getFileSystem(
        spark.sessionState.newHadoopConf())
      val lease = new org.apache.hadoop.fs.Path(base, StoreLease.LeaseName)
      StoreLease.withLease(spark, base, "long-retrain") {
        val m0 = fs.getFileStatus(lease).getModificationTime
        Thread.sleep(2000L) // > 3x the TTL
        val st = fs.getFileStatus(lease)
        val age = System.currentTimeMillis() - st.getModificationTime
        // the heartbeat renewed it: the age a cross-host waiter would
        // compute is WELL inside the TTL, and the mtime moved
        assert(age < 600L, s"lease aged ${age}ms past the 600ms TTL")
        assert(st.getModificationTime > m0, "mtime never renewed")
      }
      assert(!fs.exists(lease))
    }
  }

  test("a SECOND THREAD of this process is a second writer: it refuses instead of riding the first thread's lease") {
    val base = Files.createTempDirectory("graft_lease_thr").toString
    @volatile var second: Option[Throwable] = None
    val entered = new java.util.concurrent.CountDownLatch(1)
    val release = new java.util.concurrent.CountDownLatch(1)
    val t = new Thread(() => {
      StoreLease.withLease(spark, base, "thread-a") {
        entered.countDown()
        release.await(10, java.util.concurrent.TimeUnit.SECONDS)
      }
    })
    t.start()
    assert(entered.await(10, java.util.concurrent.TimeUnit.SECONDS))
    try {
      val e = intercept[IllegalStateException] {
        StoreLease.withLease(spark, base, "thread-b") { fail("must not run") }
      }
      assert(e.getMessage.contains("is being mutated"), e.getMessage)
    } finally { release.countDown(); t.join(10000L) }
  }

  test("a lease forcibly replaced mid-body makes the publish pointer flip refuse") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val base = Files.createTempDirectory("graft_lease_flip").toString
    val fs = new org.apache.hadoop.fs.Path(base).getFileSystem(
      spark.sessionState.newHadoopConf())
    val lease = new org.apache.hadoop.fs.Path(base, StoreLease.LeaseName)
    val codes = graft.operators.ProductQuant.uniformSyntheticCodes(emb)
    val e = intercept[IllegalStateException] {
      StoreLease.withLease(spark, base, "outer") {
        // a foreign writer stomps our lease while we mutate
        val out = fs.create(lease, true)
        out.write("1@elsewhere#7 publish 1\n".getBytes("UTF-8"))
        out.close()
        graft.operators.ProductQuant.publishIndex(spark, base, codes)
      }
    }
    assert(e.getMessage.contains("refusing to commit"), e.getMessage)
    // the hijacked writer must NOT have deleted the new holder's lease
    assert(fs.exists(lease), "release removed the foreign holder's lease")
  }

  test("rewrite fallback (setTimes-less store) renews without stomping; a reclaimer's fresh lease survives and the holder backs off hijacked") {
    sys.props("graft.lease.disableSetTimes") = "1"
    try withStale(600L) {
      val base = Files.createTempDirectory("graft_lease_rw").toString
      val fs = new org.apache.hadoop.fs.Path(base).getFileSystem(
        spark.sessionState.newHadoopConf())
      val lease = new org.apache.hadoop.fs.Path(base, StoreLease.LeaseName)
      StoreLease.withLease(spark, base, "rewrite") {
        val m0 = fs.getFileStatus(lease).getModificationTime
        Thread.sleep(1200L) // several beat periods, all via the rewrite
        val st = fs.getFileStatus(lease)
        assert(st.getModificationTime > m0,
          "the rename-fenced rewrite never renewed the lease")
        assert(StoreLease.holder(spark, base).exists(_._2 == "rewrite"),
          "the rewrite lost the holder's own lease content")
        assert(StoreLease.beatFailureCount(spark, base) == 0)
        // now a reclaimer replaces the lease: the NEXT beat must not
        // overwrite it — the holder backs off hijacked instead
        val out = fs.create(lease, true)
        out.write("1@elsewhere#5 publish 1\n".getBytes("UTF-8"))
        out.close()
        Thread.sleep(800L)
        assert(StoreLease.holder(spark, base)
          .exists(_._1 == "1@elsewhere#5"),
          "the heartbeat stomped the reclaimer's fresh lease")
        val e = intercept[IllegalStateException] {
          StoreLease.verifyHeld(spark, base)
        }
        assert(e.getMessage.contains("refusing to commit"), e.getMessage)
      }
      // release must NOT delete the foreign holder's lease
      assert(fs.exists(lease), "release removed the new holder's lease")
    } finally sys.props.remove("graft.lease.disableSetTimes")
  }

  test("verifyHeld refuses past the beat-failure threshold even while the nonce is still ours") {
    val base = Files.createTempDirectory("graft_lease_bf").toString
    StoreLease.withLease(spark, base, "stuck") {
      StoreLease.verifyHeld(spark, base) // healthy: passes
      StoreLease.injectBeatFailures(spark, base,
        StoreLease.BeatFailureLimit)
      val e = intercept[IllegalStateException] {
        StoreLease.verifyHeld(spark, base)
      }
      assert(e.getMessage.contains("heartbeat"), e.getMessage)
      assert(StoreLease.beatFailureCount(spark, base) >=
        StoreLease.BeatFailureLimit)
    }
  }

  test("release leaves no phantom lease behind a racing heartbeat: the beater is joined before the delete") {
    sys.props("graft.lease.disableSetTimes") = "1"
    try withStale(90L) { // ~30ms beat period: maximal beat/release overlap
      val base = Files.createTempDirectory("graft_lease_ph").toString
      val fs = new org.apache.hadoop.fs.Path(base).getFileSystem(
        spark.sessionState.newHadoopConf())
      val lease = new org.apache.hadoop.fs.Path(base, StoreLease.LeaseName)
      (1 to 20).foreach { i =>
        StoreLease.withLease(spark, base, s"cycle-$i") {
          Thread.sleep(25L)
        }
        assert(!fs.exists(lease),
          s"cycle $i left a phantom lease (the r19 beat/release race)")
      }
    } finally sys.props.remove("graft.lease.disableSetTimes")
  }

  test("a forcibly-replaced lease makes tombstone GC refuse BEFORE any delete (zero-survivor and fold paths)") {
    import graft.operators.ProductQuant
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val codes = ProductQuant.uniformSyntheticCodes(emb)
    def stompedGc(tombIds: org.apache.spark.sql.DataFrame): Unit = {
      val base = Files.createTempDirectory("graft_lease_gc").toString
      val fs = new org.apache.hadoop.fs.Path(base).getFileSystem(
        spark.sessionState.newHadoopConf())
      val lease = new org.apache.hadoop.fs.Path(base, StoreLease.LeaseName)
      val tomb = new org.apache.hadoop.fs.Path(base,
        ProductQuant.TombstoneDir)
      ProductQuant.publishIndex(spark, base, codes)
      ProductQuant.writeTombstones(spark, base, tombIds)
      val preFiles = fs.listStatus(tomb).count(s =>
        s.isFile && s.getPath.getName.endsWith(".parquet"))
      val e = intercept[IllegalStateException] {
        StoreLease.withLease(spark, base, "outer") {
          val out = fs.create(lease, true)
          out.write("1@elsewhere#3 gc 1\n".getBytes("UTF-8"))
          out.close()
          ProductQuant.gcTombstones(spark, base)
        }
      }
      assert(e.getMessage.contains("refusing to commit"), e.getMessage)
      // nothing the pre-fold reader listed was deleted: the original
      // sidecar part files all survive (the fold may have appended —
      // additive, correct by the superset property)
      val postFiles = fs.listStatus(tomb).count(s =>
        s.isFile && s.getPath.getName.endsWith(".parquet"))
      assert(postFiles >= preFiles,
        s"GC deleted sidecar files past a hijacked lease ($preFiles -> $postFiles)")
    }
    import org.apache.spark.sql.functions.col
    // zero-survivor path: ids no generation contains -> sidecar delete
    stompedGc(emb.select((col("vec_id") + 1000000L).as("vec_id")).limit(5))
    // fold path: ids the live generation contains -> fold + deletions
    stompedGc(emb.select("vec_id").limit(5))
  }

  test("a forcibly-replaced lease makes pruneGenerations refuse before any directory delete") {
    import graft.operators.ProductQuant
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val codes = ProductQuant.uniformSyntheticCodes(emb)
    val base = Files.createTempDirectory("graft_lease_pr").toString
    val fs = new org.apache.hadoop.fs.Path(base).getFileSystem(
      spark.sessionState.newHadoopConf())
    val lease = new org.apache.hadoop.fs.Path(base, StoreLease.LeaseName)
    (1 to 3).foreach(_ => ProductQuant.publishIndex(spark, base, codes))
    val e = intercept[IllegalStateException] {
      StoreLease.withLease(spark, base, "outer") {
        val out = fs.create(lease, true)
        out.write("1@elsewhere#4 prune 1\n".getBytes("UTF-8"))
        out.close()
        ProductQuant.pruneGenerations(spark, base, keep = 1)
      }
    }
    assert(e.getMessage.contains("refusing to commit"), e.getMessage)
    (1 to 3).foreach { g =>
      assert(fs.exists(new org.apache.hadoop.fs.Path(base, s"v$g")),
        s"prune deleted v$g past a hijacked lease")
    }
  }

  test("two simultaneous reclaimers of one stale lease: single winner, bodies never overlap") {
    withStale(400L) {
      val base = Files.createTempDirectory("graft_lease_race").toString
      val fs = new org.apache.hadoop.fs.Path(base).getFileSystem(
        spark.sessionState.newHadoopConf())
      val lease = new org.apache.hadoop.fs.Path(base, StoreLease.LeaseName)
      val out = fs.create(lease, true)
      out.write("1@elsewhere#9 publish 1\n".getBytes("UTF-8"))
      out.close()
      fs.setTimes(lease, System.currentTimeMillis() - 5000L, -1)
      val inBody = new java.util.concurrent.atomic.AtomicInteger(0)
      val overlap = new java.util.concurrent.atomic.AtomicBoolean(false)
      val refusals = new java.util.concurrent.atomic.AtomicInteger(0)
      val start = new java.util.concurrent.CountDownLatch(1)
      val ts = (1 to 2).map { i =>
        new Thread(() => {
          start.await()
          try StoreLease.withLease(spark, base, s"reclaim-$i") {
            if (inBody.incrementAndGet() > 1) overlap.set(true)
            Thread.sleep(300L)
            inBody.decrementAndGet()
          } catch { case _: IllegalStateException =>
            refusals.incrementAndGet() }
        })
      }
      ts.foreach(_.start()); start.countDown(); ts.foreach(_.join(15000L))
      assert(!overlap.get(), "two reclaimers mutated concurrently")
      assert(refusals.get() <= 1, "both reclaimers refused")
    }
  }
}
