package graft.queries

/** Shared fragments for the DuckDB oracle SQL.
  *
  * Every fragment must be the exact ANSI-SQL mirror of the column
  * transforms in [[graft.functions.Canonical]] — the correctness gate
  * hash-compares Spark output against DuckDB output of these strings.
  */
object Oracle {

  /** Canonical kinds: i=integral, m=money-double(2dp), s=string, t=timestamp. */
  def canonSql(c: String, kind: String): String = kind match {
    case "i" => s"CAST($c AS VARCHAR)"
    case "m" => s"CAST(CAST(round($c*100) AS BIGINT) AS VARCHAR)"
    case "s" => c
    case "t" => s"CAST(epoch_ms($c) AS VARCHAR)"
  }

  def serialSql(cols: Seq[(String, String)], prefix: String = "", sep: String = "|"): String =
    cols.map { case (c, k) => s"COALESCE(${canonSql(prefix + c, k)},'@NULL@')" }
      .mkString(s"concat_ws('$sep', ", ", ", ")")

  /** Full-128-bit portable row fingerprint (mirror of
    * [[graft.functions.Canonical.fingerprint]] — row-equality lane).
    */
  def fpSql(serial: String): String = s"md5($serial)"

  /** 48-bit checksum-lane fingerprint (mirror of
    * [[graft.functions.Canonical.fingerprint48]] / hex48).
    */
  def fp48Sql(serial: String): String =
    s"CAST(('0x' || substr(md5($serial),1,12)) AS BIGINT)"

  /** Executable SQL-literal form of one column (mirror of
    * [[graft.functions.Canonical.sqlLiteral]] — repair-statement payload).
    */
  def sqlLitSql(c: String, kind: String): String = {
    val v = kind match {
      case "i" => s"CAST($c AS VARCHAR)"
      case "m" => s"CAST(CAST($c AS DECIMAL(18,2)) AS VARCHAR)"
      case "s" => s"'''' || replace($c, '''', '''''') || ''''"
      case "t" => s"'''' || strftime($c, '%Y-%m-%d %H:%M:%S.%f') || ''''"
    }
    s"COALESCE($v, 'NULL')"
  }

  /** Comma-joined executable VALUES payload (mirror of
    * [[graft.functions.Canonical.sqlValues]]).
    */
  def sqlValuesSql(cols: Seq[(String, String)], prefix: String = ""): String =
    cols.map { case (c, k) => sqlLitSql(prefix + c, k) }
      .mkString("concat_ws(', ', ", ", ", ")")

  /** lineitem columns in parquet order with canonical kinds. */
  val lineitemCols: Seq[(String, String)] = Seq(
    "l_orderkey" -> "i", "l_partkey" -> "i", "l_suppkey" -> "i",
    "l_linenumber" -> "i", "l_quantity" -> "m", "l_extendedprice" -> "m",
    "l_discount" -> "m", "l_tax" -> "m", "l_returnflag" -> "s",
    "l_linestatus" -> "s", "l_shipdate" -> "t")

  /** events columns (ts handled as epoch millis) with canonical kinds. */
  val eventsCols: Seq[(String, String)] = Seq(
    "event_id" -> "i", "user_id" -> "i", "event_type" -> "s", "value" -> "m")
}
