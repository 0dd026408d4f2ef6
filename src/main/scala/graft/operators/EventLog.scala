package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Leveled run-log sink/source (SURVEY.md S9): the reference appends
  * `[ts] [LEVEL] message` lines to per-run log files
  * (`run_syncdiff_config.sh:27-53`); here the log is ALSO a relation —
  * events accumulate in a thread-safe buffer, render to the reference's
  * line format for the file artifact, and load back as a typed DataFrame
  * for querying (level filters, per-step durations).
  */
class EventLog {
  import EventLog._

  private val buf = new java.util.concurrent.ConcurrentLinkedQueue[LogEvent]()

  def log(level: String, message: String, atMillis: Long): Unit =
    buf.add(LogEvent(atMillis, level, message))

  def events: Seq[LogEvent] = {
    import scala.jdk.CollectionConverters._
    buf.iterator().asScala.toSeq
  }

  /** Reference line format: `[yyyy-MM-dd HH:mm:ss] [LEVEL] msg`. */
  def renderLines: Seq[String] = events.map { e =>
    val ts = java.time.Instant.ofEpochMilli(e.ts_ms)
      .atZone(java.time.ZoneOffset.UTC)
      .format(java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss"))
    s"[$ts] [${e.level}] ${e.message}"
  }

  def writeTo(path: java.nio.file.Path): Unit =
    java.nio.file.Files.writeString(path,
      renderLines.mkString("", "\n", "\n"),
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)

  def toDF(spark: SparkSession): DataFrame = {
    import spark.implicits._
    events.toDF()
  }
}

object EventLog {
  case class LogEvent(ts_ms: Long, level: String, message: String)

  /** Parse a reference-format log file back into the typed relation. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .select(
        to_timestamp(
          regexp_extract(col("value"), "^\\[([^\\]]+)\\]", 1),
          "yyyy-MM-dd HH:mm:ss").as("ts"),
        regexp_extract(col("value"), "^\\[[^\\]]+\\] \\[([A-Z]+)\\]", 1)
          .as("level"),
        regexp_extract(col("value"), "^\\[[^\\]]+\\] \\[[A-Z]+\\] (.*)$", 1)
          .as("message"))
      .filter(col("level") =!= "")
}
