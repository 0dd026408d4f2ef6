package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Build-time extension point — the sanctioned Spark registration route
  * (SURVEY.md §7.3): sessions built with
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * get every native graft function (`cosine_score`, `shingle_hashes`,
  * `simhash48`, `winnow_fp`) injected before the first query, so SQL-only
  * users (`spark-sql`, Thrift server, notebooks) reach them without any
  * engine API call. The operators ALSO self-register at runtime
  * ([[graft.functions.CosineScore.register]] /
  * [[graft.functions.TextKernels.register]]) so caller-provided sessions
  * without this config keep working; both routes share the same
  * descriptors.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(graft.functions.CosineScore.descriptor)
    ext.injectFunction(graft.functions.IvfKernels.descriptor)
    graft.functions.TextKernels.descriptors.foreach(ext.injectFunction)
    graft.functions.PqKernels.descriptors.foreach(ext.injectFunction)
    graft.functions.JlKernels.descriptors.foreach(ext.injectFunction)
    graft.functions.LshKernels.descriptors.foreach(ext.injectFunction)
    graft.functions.ImageKernels.descriptors.foreach(ext.injectFunction)
  }
}
