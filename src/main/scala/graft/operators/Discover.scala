package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Discovery stage (SURVEY.md S1/P1-P5, §2.11 check_sql).
  *
  * The reference discovers comparison targets with a user-supplied SQL over
  * `information_schema.tables` filtered on row count and PK class
  * (`/root/reference/syncdiff_config2/config.toml:16`), contract-checked to
  * return (schema_name, table_name) (`README.md:226-227`). For file sources
  * the catalog relation is a *manifest* DataFrame built from the parquet
  * snapshots plus declared PK metadata; any user `check_sql` runs against it
  * via `spark.sql` with the same two-column contract.
  */
object Discover {

  /** Catalog manifest: (schema_name, table_name, table_rows, pk_kind).
    * Row counts come from parquet footer metadata (a metadata-only Spark
    * job per table — no data scan), matching the reference's reliance on
    * stats (`information_schema.tables.TABLE_ROWS`).
    */
  private val manifestCache =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[(String, String, Long, String)]]()

  def manifest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // Row counts are parquet-footer metadata; memoize per fixture dir so
    // the discovery/config/cleanup queries don't re-issue 10 count jobs
    // each — the reference likewise reads stats, not data (TABLE_ROWS,
    // config.toml:16). Snapshot dirs are immutable, so the cache is safe.
    val rows = manifestCache.computeIfAbsent(dir, _ =>
      Tables.all.map { t =>
        ("main", t, Tables.load(spark, dir, t).count(), Tables.pkKind(t))
      })
    rows.toDF("schema_name", "table_name", "table_rows", "pk_kind")
  }

  /** Reference default check_sql translated to the manifest relation, with
    * the billion-row floor scaled to the fixture sizes (`config.toml:16`).
    */
  def defaultCheckSql(minRows: Long): String =
    s"""SELECT schema_name, table_name FROM graft_manifest
       |WHERE table_rows > $minRows AND pk_kind = 'NONCLUSTERED'
       |ORDER BY table_name""".stripMargin

  /** Run a user check_sql against the manifest; enforce the reference's
    * two-string-column contract (`README.md:226-227`). A third or further
    * column is tolerated and truncated, as step1 does
    * (`step1_query_tables.sh:141,146`).
    */
  def discover(spark: SparkSession, dir: String, checkSql: String): DataFrame = {
    manifest(spark, dir).createOrReplaceTempView("graft_manifest")
    val out = spark.sql(checkSql)
    require(out.schema.length >= 2,
      s"check_sql must return at least (schema_name, table_name); got ${out.schema.simpleString}")
    out.select(out.columns.take(2).map(col): _*)
      .toDF("schema_name", "table_name")
      .select(col("schema_name").cast(StringType), col("table_name").cast(StringType))
      // reference also drops client warning leakage lines (step1:143-145)
      .filter(!col("schema_name").startsWith("mysql:"))
  }
}
