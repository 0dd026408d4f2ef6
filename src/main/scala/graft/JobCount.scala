package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import scala.collection.mutable.ArrayBuffer

/** One-off diagnostic: count Spark JOBS (actions) a named query fires. */
object JobCount {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = {
      val b = SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
      Tables.sessionConf.foreach { case (k, v) => b.config(k, v) }
      b.getOrCreate()
    }
    spark.sparkContext.setLogLevel("ERROR")
    Tables.all.foreach(t => Tables.load(spark, sfDir, t).count())
    args.foreach { name =>
      val jobs = ArrayBuffer.empty[String]
      val l = new SparkListener {
        override def onJobStart(js: SparkListenerJobStart): Unit = jobs.synchronized {
          jobs += s"stages=${js.stageInfos.size} ${js.stageInfos.map(_.name).mkString(" | ").take(160)}"
        }
      }
      spark.sparkContext.addSparkListener(l)
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(400)
      spark.sparkContext.removeSparkListener(l)
      println(f"[jobs] $name -> ${jobs.size} jobs, $dt%.3f s")
      jobs.foreach(j => println(s"   $j"))
    }
    spark.stop()
  }
}
