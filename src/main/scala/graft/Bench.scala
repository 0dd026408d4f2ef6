package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    Tables.sessionConf.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the session (codegen, file listing, JIT) outside the timings so
    // the first query measures itself, not startup.
    Tables.all.foreach(t => Tables.load(spark, sfDir, t).count())
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      // A crashed query must FAIL the bench, not record a near-zero time
      // that reads as an improvement (ADVICE/VERDICT r02).
      try { fn(spark, sfDir).count() } catch {
        case e: Throwable =>
          errors(name) = s"${e.getClass.getSimpleName}: ${
            Option(e.getMessage).getOrElse("").takeWhile(_ != '\n').take(200)}"
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    def jstr(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val qs = results.map { case (k, v) => jstr(k) + ":" + v }
      .mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => jstr(k) + ":" + jstr(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"sf":"$sfDir"}""")
    spark.stop()
    if (errors.nonEmpty) {
      System.err.println(s"bench: ${errors.size} quer${if (errors.size == 1) "y" else "ies"} failed: ${errors.keys.mkString(", ")}")
      sys.exit(1)
    }
  }
}
