package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Canonical, engine-portable row serialization + fingerprinting.
  *
  * The reference's diff engine compares chunks by checksum and rows by value
  * (published `sync_diff_inspector` behavior enabled at
  * `/root/reference/syncdiff_config2/my_database_users.toml:40,45`). To make
  * every checksum independently verifiable by an external SQL oracle
  * (DuckDB), the row hash here is NOT Spark-private (`xxhash64`) but a
  * *portable* construction reproducible in any engine with `md5`:
  *
  *   serial(row)  = concat_ws('|', canonical(col1), ..., canonical(colN))
  *   fp(row)      = bigint(first 12 hex chars of md5(serial))   -- 48 bits
  *   checksum(S)  = sum(fp(row) for row in S)                   -- commutative
  *
  * 48-bit fingerprints summed over <= 2^14-row chunks stay far below 2^63,
  * and the sum is order-independent, so partial aggregation (map-side
  * combine) applies — Catalyst plans this as a two-phase HashAggregate with
  * no extra shuffle beyond the groupBy(chunk).
  *
  * Canonicalization rules (must match the oracle SQL in
  * [[graft.SparkEntry.oracleSql]] exactly):
  *   - integral types: decimal string form
  *   - doubles (money-like, 2dp in fixtures): round(x*100) as bigint —
  *     avoids engine-specific double→string formatting (SURVEY.md §7.4)
  *   - timestamps: epoch milliseconds (UTC session)
  *   - strings: verbatim
  *   - NULL: sentinel "@NULL@" (concat_ws silently drops nulls — SURVEY.md
  *     §7.4 "NULL semantics in row hash")
  *
  * A second, faster lane [[fingerprintFast]] uses `xxhash64` for
  * engine-internal use (two independent hash lanes per SURVEY.md §7.4
  * "collision discipline"); only the portable lane is oracle-checked.
  */
object Canonical {

  val NullSentinel = "@NULL@"

  /** Canonical string form of one column, by declared type. */
  def canonical(c: Column, dt: DataType): Column = dt match {
    case ByteType | ShortType | IntegerType | LongType => c.cast(StringType)
    case BooleanType => c.cast(IntegerType).cast(StringType)
    case FloatType | DoubleType =>
      // 2-decimal fixed-point; exact for the fixture money columns and
      // identical to DuckDB's CAST(round(x*100) AS BIGINT).
      round(c.cast(DoubleType) * lit(100)).cast(LongType).cast(StringType)
    case _: DecimalType => c.cast(StringType)
    case TimestampType => unix_millis(c).cast(StringType)
    case TimestampNTZType =>
      // Parquet TIMESTAMP(isAdjustedToUTC=false) surfaces as NTZ; the
      // engine runs with a UTC session, so NTZ→TZ cast is the identity
      // and epoch millis match DuckDB's epoch_ms over the same file.
      unix_millis(c.cast(TimestampType)).cast(StringType)
    case DateType => c.cast(StringType)
    case StringType => c
    case BinaryType => md5(c)
    case other =>
      // Nested/array types: canonical JSON; not oracle-portable, used only
      // by the engine-internal lane.
      to_json(struct(c.as("v")))
  }

  private def serialize(cols: Seq[(Column, DataType)], sep: String): Column =
    concat_ws(sep, cols.map { case (c, dt) =>
      coalesce(canonical(c, dt), lit(NullSentinel))
    }: _*)

  /** Pipe-joined canonical serialization of the given columns. */
  def serial(cols: Seq[(Column, DataType)]): Column = serialize(cols, "|")

  /** Comma-joined form — used as a VALUES payload by the fix-SQL sink. */
  def serialCsv(cols: Seq[(Column, DataType)]): Column = serialize(cols, ",")

  /** Portable 48-bit row fingerprint (oracle-reproducible). */
  def fingerprint(cols: Seq[(Column, DataType)]): Column =
    hex48(md5(serial(cols)))

  /** First 12 hex chars of a hex string, as a bigint (48 bits). */
  def hex48(hexCol: Column): Column =
    conv(substring(hexCol, 1, 12), 16, 10).cast(LongType)

  /** Engine-internal second hash lane: xxhash64 over the same serial form.
    * Codegen'd, faster, not reproducible outside Spark.
    */
  def fingerprintFast(cols: Seq[(Column, DataType)]): Column =
    xxhash64(serial(cols))

  /** Chunk id from a numeric leading-PK column: contiguous ranges of
    * `width` key values — the file-source analogue of the reference's
    * PK-range chunks (`my_database_users.toml:45`, chunk-size 5000).
    * Positive keys only in fixtures; floor handles negatives too.
    */
  def chunkId(pk: Column, width: Long): Column =
    floor(pk / lit(width)).cast(LongType)
}
