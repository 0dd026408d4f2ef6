package graft.tools

import graft.functions.Canonical
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only scratch main for debugging canonicalization parity. */
object DebugSerial {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = graft.Tables.load(spark, "/root/testdata/sf0.01", "lineitem")
    val cols = li.schema.fields.toSeq.map(f => (col(f.name), f.dataType))
    li.filter(col("l_orderkey") === 0 && col("l_linenumber") === 1)
      .select(
        Canonical.serial(cols).as("serial"),
        md5(Canonical.serial(cols)).as("m"),
        Canonical.fingerprint(cols).as("fp"))
      .show(10, truncate = false)
    spark.stop()
  }
}
