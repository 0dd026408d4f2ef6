package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query registries live in `graft.queries.*`; each registry pairs Spark
  * DataFrame implementations with DuckDB oracle SQL over the same parquet
  * fixtures.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Runs the full compare pipeline (discover → chunk checksums → row diff
    * → report) and returns the merged report relation.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("compare_report")(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2 + the north-star
    * pipeline extensions (dedup/similarity/text/multimodal). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.CoreQueries.queries ++ graft.queries.PipelineQueries.queries ++
      graft.queries.EventQueries.queries ++ graft.queries.OlapQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.CoreQueries.oracle ++ graft.queries.PipelineQueries.oracle ++
      graft.queries.EventQueries.oracle ++ graft.queries.OlapQueries.oracle
}
