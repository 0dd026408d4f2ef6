package graft

/** Scan-level plan audit — the `.explain` discipline, mechanized: at
  * 100 TB the difference between a query that works and one that melts
  * the cluster is usually visible in three scan properties, so they are
  * pinned as tests instead of re-read by hand each round:
  *
  *  - selective predicates must reach the parquet scan as
  *    `PushedFilters` (a filter evaluated post-scan reads everything);
  *  - projections must prune `ReadSchema` (a 7-column aggregate that
  *    reads all 16 lineitem columns is wrong at any scale);
  *  - the hot aggregation path must sit inside WholeStageCodegen;
  *  - the single-scan PQ/ADC encode must STAY single-scan (the r10
  *    regression class: the encode union re-scanned the corpus once
  *    per subspace — 8 scans — without any correctness signal).
  */
class ScanAuditSpec extends SparkSpec {

  /** Post-EXECUTION plan: before an action, AQE's executedPlan prints
    * the unfinalized skeleton (no codegen stages, scan details elided);
    * collect() — which runs THIS queryExecution, unlike count(), which
    * plans a new one — finalizes it, and toString then carries `*(n)`
    * whole-stage markers and the real scan metadata.
    */
  private def planOf(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("selective filters reach the parquet scan as pushed filters") {
    val p = planOf("q6_revenue_delta")
    val pushed = "PushedFilters: \\[[^\\]]+\\]".r.findAllIn(p).toSeq
    assert(pushed.nonEmpty, "no non-empty PushedFilters in plan")
    // the sargable rewrite (OlapQueries.tsRange) must land the shipdate
    // RANGE in the scan, not just null checks — Spark truncates the
    // printed filter list, so match the column inside the bracket
    assert(pushed.exists(s =>
      s.contains("GreaterThan") || s.contains("LessThan") ||
        s.contains("EqualTo")),
      s"no comparison predicate pushed to scan: $pushed")
    assert(p.contains("l_shipdate"), "shipdate absent from pushed scan")
  }

  test("projection prunes the scan schema to referenced columns") {
    val p = planOf("q1_pricing_summary")
    val scans = p.linesIterator.filter(_.contains("ReadSchema")).toSeq
    assert(scans.nonEmpty)
    // the pricing summary touches 7 lineitem columns; the scan must not
    // drag the wide text columns along
    assert(scans.exists(_.contains("l_quantity")))
    assert(!scans.exists(_.contains("l_comment")),
      s"unpruned lineitem scan:\n${scans.mkString("\n")}")
  }

  test("hot aggregation runs inside whole-stage codegen") {
    // toString abbreviates WholeStageCodegen stages as `*(n)` operator
    // prefixes — the aggregation pipeline must carry them
    val p = planOf("q1_pricing_summary")
    assert(p.linesIterator.exists(l =>
      l.contains("*(") && l.contains("HashAggregate")),
      s"q1 aggregation fell out of whole-stage codegen:\n$p")
  }

  test("IVF assignment runs inside whole-stage codegen (no RDD hop)") {
    // r11's lane was rdd.mapPartitions + createDataFrame — it appeared
    // in the plan as a `Scan ExistingRDD` barrier that forced eager
    // planning outside AQE and evaluated per-row Scala closures. The
    // r12 `ivf_assign` kernel must keep the whole assignment relational:
    // no ExistingRDD anywhere, and the kernel projection inside a
    // `*(n)` whole-stage-codegen stage.
    for (q <- Seq("ann_ivf", "ann_ivf_kmeans")) {
      val p = planOf(q).split("== Initial Plan ==").head
      assert(!p.contains("ExistingRDD"),
        s"$q still plans an RDD scan barrier:\n$p")
      val kernelLines = p.linesIterator.filter(_.contains("ivf_assign")).toSeq
      assert(kernelLines.nonEmpty, s"$q plan lost the ivf_assign kernel")
      assert(kernelLines.exists(_.contains("*(")),
        s"$q ivf_assign fell out of whole-stage codegen:\n" +
          kernelLines.mkString("\n"))
    }
    // the brute-force lane (r12): the corpus streams through the
    // cosine_all kernel (one static call per corpus row vs the
    // broadcast candidate set) — no join, no RDD scan barrier
    val bf = planOf("knn_cosine").split("== Initial Plan ==").head
    assert(!bf.contains("ExistingRDD"),
      s"knn_cosine still plans an RDD scan barrier:\n$bf")
    val bfKernel = bf.linesIterator.filter(_.contains("cosine_all")).toSeq
    assert(bfKernel.nonEmpty, "knn_cosine lost the cosine_all kernel")
  }

  test("PQ/ADC encode stays single-scan (no per-subspace corpus re-scan)") {
    // codes(1) + query LUT(1) + rerank sides(2) + shortlist count(1):
    // five embedding scans is the designed shape; the r10 per-subspace
    // union form planned 18+. A sixth scan means an encode path
    // regressed to scan-per-subspace.
    // the adaptive plan's toString appends an "== Initial Plan ==" copy
    // of the whole tree — count scans in the FINAL section only
    def scansIn(name: String): Int = {
      val p = planOf(name).split("== Initial Plan ==").head
      "Scan parquet".r.findAllIn(p).size
    }
    val scans = scansIn("ann_pq_adc")
    assert(scans <= 5, s"ann_pq_adc plans $scans parquet scans (want <= 5)")
    val scans2 = scansIn("ann_ivfadc")
    assert(scans2 <= 6,
      s"ann_ivfadc plans $scans2 parquet scans (want <= 6)")
  }

  test("PCA census is one pruned scan; projection plans no join and no second scan") {
    // covariance census: ONE corpus pass, embedding column only, and
    // the d(d+1)/2+d cell aggregation must carry a partial_ stage
    // (map-side combine is what bounds the shuffle at census size).
    val cov = {
      val df = operators.Pca.covarianceCells(
        Tables.load(spark, sfDir, "embeddings"))
      df.collect()
      df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    }
    assert("Scan parquet".r.findAllIn(cov).size == 1,
      s"covariance census re-scans the corpus:\n$cov")
    val covScan = cov.linesIterator.filter(_.contains("ReadSchema")).toSeq
    assert(covScan.exists(_.contains("embedding")) &&
      !covScan.exists(_.contains("label")),
      s"census scan not pruned to the embedding column:\n$covScan")
    assert(cov.contains("partial_"),
      s"census aggregation lost map-side partials:\n$cov")
    // the projection face: the returned plan must be scan → kernel
    // projection → sort. No join (the vector is a literal), no second
    // corpus scan (the census pass happened at build time, not in THIS
    // plan), no RDD barrier.
    val proj = planOf("embed_pca_project").split("== Initial Plan ==").head
    assert("Scan parquet".r.findAllIn(proj).size == 1,
      s"projection plans extra scans:\n$proj")
    assert(!proj.toLowerCase.contains("join"),
      s"projection plans a join against the component vector:\n$proj")
    assert(!proj.contains("ExistingRDD"),
      s"projection plans an RDD barrier:\n$proj")
  }
}
