package graft

import graft.operators.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Cross-session kernel resolution (VERDICT r15 #6): runtime
  * self-registration ([[graft.functions.LshKernels.register]] via the
  * ACTIVE session inside a Column builder) only covers the session
  * that happened to be active at build time — a plan RESOLVED against
  * a different `newSession()` sibling throws unresolved-function. The
  * sanctioned fix is build-time injection: a session built
  * `withExtensions(new GraftExtensions)` (what [[Cli.buildSession]]
  * now does, and what `spark.sql.extensions=graft.GraftExtensions`
  * does for SQL-only users) carries every native kernel in ITS
  * function registry and in every `newSession()` descendant, because
  * Spark re-applies the injected functions when each session's state
  * is instantiated.
  */
class ExtensionsSpec extends SparkSpec {

  private def withSessions[A](f: (SparkSession, SparkSession) => A): A = {
    // the shared TestSession root has NO extensions; build a second
    // root session (same SparkContext) WITH them, then restore the
    // default/active pointers for the other suites
    val root = spark
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val extRoot = SparkSession.builder()
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      f(extRoot, extRoot.newSession())
    } finally {
      SparkSession.setDefaultSession(root)
      SparkSession.setActiveSession(root)
    }
  }

  test("GraftExtensions: a plan built on one session resolves on a sibling") {
    withSessions { (extRoot, sibling) =>
      assert(extRoot ne sibling)
      // build the DataFrame ON THE SIBLING while a DIFFERENT session
      // is active: the runtime-registration route would only register
      // the kernel into extRoot (the active session), so resolution
      // against the sibling's registry succeeds ONLY via the
      // extension injection
      SparkSession.setActiveSession(extRoot)
      import sibling.implicits._
      val df = Seq((1L, Seq(1.0f, -2.0f, 3.0f)),
          (2L, Seq(-1.0f, 2.0f, -3.0f)))
        .toDF("vec_id", "embedding")
      assert(df.sparkSession eq sibling)
      val got = df.select(col("vec_id"),
          Similarity.normN(col("embedding"), 3).as("nrm"),
          Similarity.signBucket(col("embedding"), 3).as("b"))
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
        .sortBy(_._1)
      assert(got.map(_._3).toSeq == Seq(1L | 4L, 2L))
      assert(got.forall(r => math.abs(r._2 - math.sqrt(14.0)) < 1e-12))
      // the injected set really is EVERY native kernel (round-16
      // review #2: ivf_assign had been skipped from the extension list)
      Seq("cosine_score", "ivf_assign", "shingle_hashes", "simhash48",
        "winnow_fp", "pq_encode", "jl_project", "vec_nrm", "sign_bucket")
        .foreach { fn =>
          assert(sibling.sessionState.functionRegistry.functionExists(
            org.apache.spark.sql.catalyst.FunctionIdentifier(fn)),
            s"$fn missing from the sibling session's registry")
        }
    }
  }

  test("without extensions, cross-session resolution fails (the caveat)") {
    // the negative control that PINS why buildSession injects: the
    // non-extensions TestSession root + a sibling built from it
    val sibling = spark.newSession()
    SparkSession.setActiveSession(spark)
    try {
      import sibling.implicits._
      val df = Seq((1L, Seq(1.0f))).toDF("vec_id", "embedding")
      // builder registers into the ACTIVE session (the root), so the
      // sibling's registry lacks the kernel and analysis throws
      val e = intercept[Exception] {
        df.select(Similarity.signBucket(col("embedding"), 1)).collect()
      }
      val msg = e.getMessage
      assert(msg != null && (msg.contains("sign_bucket") ||
        msg.contains("UNRESOLVED_ROUTINE")), msg)
    } finally SparkSession.setActiveSession(spark)
  }
}
