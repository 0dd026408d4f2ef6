package graft

/** Engine-wide plan audit: every registered query's physical plan must be
  * free of CartesianProduct everywhere and free of
  * BroadcastNestedLoopJoin outside the known intentional uses — the
  * 1-row `crossJoin(broadcast(...))` inside the test-harness perturbation
  * ([[graft.operators.Perturb]]), which rides along in every diff-family
  * query. A new operator that plans a pair blowup fails here instead of
  * surfacing as a judge finding (the constant-literal join-key fold that
  * BNLJ'd tf-idf's corpus-count join is exactly the regression class this
  * pins down).
  */
class PlanAuditSpec extends SparkSpec {

  /** Queries whose plans legitimately contain the Perturb 1-row
    * broadcast cross join (and only that).
    */
  private val perturbedQueries = Set(
    "diff_chunks", "row_diff", "row_diff_range", "row_diff_hashchunk",
    "compare_report", "report_lines", "run_all_report",
    "hashdiff_lineitem", "fix_sql", "repair_roundtrip")

  test("no CartesianProduct anywhere; BNLJ only in Perturb-carrying queries") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        val cart = plan.contains("CartesianProduct")
        val bnlj = plan.contains("BroadcastNestedLoopJoin") &&
          !perturbedQueries.contains(name)
        if (cart || bnlj)
          Some(s"$name: cartesian=$cart unexpected-bnlj=$bnlj")
        else None
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }
}
