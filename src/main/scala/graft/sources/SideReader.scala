package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Comparison-side readers (SURVEY.md S5/S6): every diff operator is
  * binary over two homologous relations; this is the abstraction that
  * produces one side.
  *
  *  - [[ParquetDir]]: the primary (tested) source — a directory of
  *    immutable parquet snapshots. Immutability IS the snapshot pin: both
  *    sides of a comparison read consistent versions by construction,
  *    matching the reference's `snapshot = "auto"`
  *    (`my_database_users.toml:20,29`).
  *  - [[Jdbc]]: the live-database parity path. Chunked scans map to
  *    Spark's partitioned JDBC read (partitionColumn/bounds/numPartitions
  *    — the reference's chunk-size and thread-count,
  *    `my_database_users.toml:5,45`); an optional snapshot timestamp wraps
  *    the table in a TiDB `AS OF TIMESTAMP` subquery (published TiDB
  *    stale-read syntax), the dialect-specific analogue of `snapshot`.
  *    Option construction is pure and unit-tested; execution requires a
  *    live endpoint.
  */
object SideReader {

  sealed trait Side

  /** Immutable snapshot directory: `<dir>/<table>.parquet`. */
  case class ParquetDir(dir: String) extends Side

  /** Snapshot-pin rendering, per endpoint dialect (S6). The pin always
    * takes the same wrapped-subquery shape — `(SELECT * FROM t <clause>)
    * AS t` as Spark's `dbtable` — so partition predicates apply over a
    * derived table; only the clause text is dialect-specific.
    *
    *  - [[TiDbSnapshot]]: the published TiDB stale-read syntax
    *    (`AS OF TIMESTAMP '<ts>'`) — the reference's `snapshot` option
    *    (`my_database_users.toml:20,29`). Needs a TiDB endpoint.
    *  - [[CommentSnapshot]]: the identical clause inside a SQL comment,
    *    for engines without time travel. The wrapped-subquery READ PATH
    *    — the part of the pin that is engine-independent plumbing —
    *    executes verbatim against any JDBC endpoint (embedded Derby in
    *    `SideReaderSpec`), while the pin text rides along inert. This is
    *    a test/compat shim, not a semantic snapshot.
    */
  sealed trait SnapshotDialect { def clause(ts: String): String }
  case object TiDbSnapshot extends SnapshotDialect {
    def clause(ts: String): String = s"AS OF TIMESTAMP '$ts'"
  }
  case object CommentSnapshot extends SnapshotDialect {
    def clause(ts: String): String = s"/* AS OF TIMESTAMP '$ts' */"
  }

  /** Partitioned JDBC scan of `schema.table`. */
  case class Jdbc(
      url: String,
      schema: String,
      table: String,
      user: String,
      password: String,
      pkColumn: String,
      lowerBound: Long,
      upperBound: Long,
      chunkSize: Long,
      snapshotTs: Option[String] = None,
      dialect: SnapshotDialect = TiDbSnapshot) extends Side

  /** Spark JDBC reader options for a [[Jdbc]] side: chunk-size rows per
    * partition (C1), `dbtable` wrapped in an AS OF subquery when a
    * snapshot is pinned (S6).
    */
  def jdbcOptions(j: Jdbc): Map[String, String] = {
    val span = math.max(j.upperBound - j.lowerBound + 1, 1L)
    val numPartitions = math.max(1L, (span + j.chunkSize - 1) / j.chunkSize)
    val target = j.snapshotTs match {
      case Some(ts) =>
        s"(SELECT * FROM ${j.schema}.${j.table} ${j.dialect.clause(ts)}) AS t"
      case None => s"${j.schema}.${j.table}"
    }
    Map(
      "url" -> j.url,
      "dbtable" -> target,
      "user" -> j.user,
      "password" -> j.password,
      "partitionColumn" -> j.pkColumn,
      "lowerBound" -> j.lowerBound.toString,
      "upperBound" -> j.upperBound.toString,
      "numPartitions" -> numPartitions.toString)
  }

  /** Live-endpoint assembly (S5/S6): a [[Jdbc]] side from a parsed
    * reference-config source block. TiDB speaks the MySQL wire protocol,
    * so the URL is the standard MySQL JDBC form; the snapshot pin renders
    * through [[TiDbSnapshot]]. This is the ONE seam a sandbox cannot
    * execute live (no TiDB endpoint), so the full rendered option map —
    * URL and `AS OF TIMESTAMP` dbtable text — is golden-text-pinned in
    * `ParitySpec` ("config-to-endpoint assembly renders the exact live
    * TiDB strings"): the strings a real endpoint would receive are fixed
    * by construction even though no endpoint ever receives them here.
    */
  def fromConf(src: graft.conf.SourceConf, schema: String, table: String,
      pkColumn: String, lowerBound: Long, upperBound: Long,
      chunkSize: Long, snapshotTs: Option[String]): Jdbc =
    Jdbc(s"jdbc:mysql://${src.host}:${src.port}/$schema", schema, table,
      src.user, src.password, pkColumn, lowerBound, upperBound, chunkSize,
      snapshotTs, TiDbSnapshot)

  def read(spark: SparkSession, side: Side, table: String): DataFrame =
    side match {
      case ParquetDir(dir) => graft.Tables.load(spark, dir, table)
      case j: Jdbc =>
        spark.read.format("jdbc").options(jdbcOptions(j)).load()
    }
}
