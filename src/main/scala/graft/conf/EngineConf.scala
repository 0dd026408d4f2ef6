package graft.conf

import java.util.Base64
import scala.util.Try

/** Engine configuration (SURVEY.md S2/F1/F7) — the reference's
  * `config.toml` surface (`/root/reference/syncdiff_config2/config.toml:1-22`)
  * as a typed record. The reference parses TOML line-oriented
  * (`grep "^key" | cut -d'"' -f2`, `step1_query_tables.sh:67-95`); this
  * parser implements the same flat `key = value` subset (strings, ints),
  * ignoring comments/sections, so every reference config round-trips.
  */
case class SourceConf(host: String, port: Int, user: String, password: String) {
  /** Masked form for logs (`step1_query_tables.sh:79-90`). */
  def masked: String = s"$user@$host:$port pw=${password.take(4)}****"
}

case class EngineConf(
    master: SourceConf,
    slave: SourceConf,
    checkSql: String,
    threadCount: Int,
    chunkSize: Long,
    outputDir: String,
    /** Reference `check-struct-only` (`my_database_users.toml:11`):
      * compare schemas only, skip the data stage entirely.
      */
    structOnly: Boolean = false)

object EngineConf {

  /** base64-decode with verbatim fallback — the reference treats a
    * non-decodable password as plaintext (`step1_query_tables.sh:30-48`).
    */
  def decodePassword(raw: String): String =
    Try(new String(Base64.getDecoder.decode(raw.trim), "UTF-8"))
      .filter(_.forall(c => c >= ' ' && c < 127))
      .getOrElse(raw)

  /** Flat `key = value` TOML-subset parse: quoted strings or bare ints;
    * `#` comments and `[section]` headers ignored.
    */
  def parseKv(toml: String): Map[String, String] =
    toml.linesIterator
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#") && !l.startsWith("["))
      .flatMap { l =>
        l.split("=", 2) match {
          case Array(k, v) =>
            val key = k.trim
            val value = v.trim.stripPrefix("\"").stripSuffix("\"")
            if (key.nonEmpty) Some(key -> value) else None
          case _ => None
        }
      }
      .toMap

  private val required = Seq(
    "master_ip", "master_port", "master_user", "master_password",
    "slave_ip", "slave_port", "slave_user", "slave_password",
    "check_sql", "output_dir")

  /** Parse + contract-check (`step1_query_tables.sh:98-101` requires the
    * connection/check keys; thread_count and chunk_size default like the
    * reference template).
    */
  def parse(toml: String): EngineConf = {
    val kv = parseKv(toml)
    val missing = required.filterNot(kv.contains)
    require(missing.isEmpty, s"config missing required keys: ${missing.mkString(", ")}")
    def src(p: String) = SourceConf(
      kv(s"${p}_ip"), kv(s"${p}_port").toInt, kv(s"${p}_user"),
      decodePassword(kv(s"${p}_password")))
    EngineConf(
      master = src("master"),
      slave = src("slave"),
      checkSql = kv("check_sql"),
      threadCount = kv.getOrElse("thread_count", "8").toInt,
      chunkSize = kv.getOrElse("chunk_size", "5000").toLong,
      outputDir = kv("output_dir"),
      structOnly = kv.getOrElse("check_struct_only",
        kv.getOrElse("check-struct-only", "false")).toBoolean)
  }

  /** Parse a generated task TOML back into its compare knobs — the
    * inverse of [[renderTaskToml]], for the standalone `compare` stage
    * (the reference runs each generated config file directly,
    * `step3_run_syncdiff.sh:106-123`). Returns
    * (schema, table, chunkSize, structOnly).
    */
  def parseTaskToml(toml: String): (String, String, Long, Boolean) = {
    val kv = parseKv(toml)
    val target = "\"([^\"]+)\"".r
      .findFirstMatchIn(kv.getOrElse("target-check-tables", ""))
      .map(_.group(1))
      .getOrElse(throw new IllegalArgumentException(
        "task config missing target-check-tables"))
    val parts = target.split("\\.", 2)
    require(parts.length == 2, s"target-check-tables not schema.table: $target")
    (parts(0), parts(1),
      kv.getOrElse("chunk-size", "5000").toLong,
      kv.getOrElse("check-struct-only", "false").toBoolean)
  }

  /** Per-table task-config rendering (SURVEY.md S4 — the `sed` template
    * instantiation at `step2_generate_configs.sh:112-124`).
    */
  def renderTaskToml(conf: EngineConf, schema: String, table: String,
                     runId: String): String =
    s"""# auto-generated diff task config
       |check-thread-count = ${conf.threadCount}
       |export-fix-sql = true
       |check-struct-only = ${conf.structOnly}
       |
       |[data-sources.master]
       |host = "${conf.master.host}"
       |port = ${conf.master.port}
       |user = "${conf.master.user}"
       |snapshot = "auto"
       |
       |[data-sources.slave]
       |host = "${conf.slave.host}"
       |port = ${conf.slave.port}
       |user = "${conf.slave.user}"
       |snapshot = "auto"
       |
       |[task]
       |output-dir = "${conf.outputDir}/${schema}_${table}_$runId"
       |target-check-tables = ["$schema.$table"]
       |chunk-size = ${conf.chunkSize}
       |range = "1 = 1"
       |""".stripMargin
}
