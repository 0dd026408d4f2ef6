package graft
import org.apache.spark.sql.SparkSession

/** Subset bench: warm min-of-k timings for NAMED queries only — the
  * fast perf loop while iterating on one operator ([[Bench]] runs the
  * full suite and takes ~12 min at sf0.1; this takes seconds). Same
  * discipline as Bench: session warm-up outside timings, interleaved
  * rep passes, min per query.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.QBench q1 q2 ...
  */
object QBench {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "QBench: pass query names")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt.max(1)
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    Tables.sessionConf.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.all.foreach(t => Tables.load(spark, sfDir, t).count())
    val samples = scala.collection.mutable.LinkedHashMap.empty[String, List[Double]]
    (1 to reps).foreach { _ =>
      args.foreach { name =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        samples(name) = samples.getOrElse(name, Nil) :+ dt
      }
    }
    samples.foreach { case (name, ss) =>
      println(f"[qbench] $name%-28s min=${ss.min}%7.3f  samples=${ss.map(s => f"$s%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
