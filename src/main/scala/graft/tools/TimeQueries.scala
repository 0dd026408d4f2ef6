package graft.tools

import graft.{SparkEntry, Tables}
import org.apache.spark.sql.SparkSession

/** Dev-only single-query bench: warm session, interleaved min-of-k reps —
  * the same measurement discipline as [[graft.Bench]] — restricted to the
  * queries named on the command line, so a regression can be re-measured
  * in seconds instead of re-running the whole suite. NOT driver contract.
  *
  * Usage: TimeQueries <sfDir> <query> [query ...]
  * Env:   SPARK_GRAFT_CPUS (default 4), SPARK_GRAFT_BENCH_REPS (default 3)
  */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt.max(1)
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    Tables.sessionConf.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.all.foreach(t => Tables.load(spark, sfDir, t).count())
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val samples = scala.collection.mutable.LinkedHashMap
      .empty[String, List[Double]]
    (1 to reps).foreach { _ =>
      names.foreach { name =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        samples(name) = samples.getOrElse(name, Nil) :+ dt
      }
    }
    samples.foreach { case (name, ss) =>
      println(f"$name%-28s min=${ss.min}%.3f s  samples=${
        ss.map(s => f"$s%.3f").mkString("[", ",", "]")}")
    }
    spark.stop()
  }
}
