package graft

import graft.conf.EngineConf
import graft.operators._
import org.apache.spark.sql.SparkSession

/** Command-line entry point (SURVEY.md §7.1 module 10) — the engine's
  * `run_all.sh` analogue. Subcommands mirror the reference's stages:
  *
  *   discover  <config.toml> <fixtureDir>          step1: table discovery
  *   generate  <config.toml> <fixtureDir> <runId>  step2: task configs
  *   run-all   <config.toml> <fixtureDir>          steps 1-3 + report
  *   doctor    <config.toml> <fixtureDir>          preflight checks
  *
  * Exit code follows the reference (`step3_run_syncdiff.sh:247-249`):
  * non-zero iff any compared table differs (run-all) or a check fails
  * (doctor). For fixtures the "slave" side is the identity derivation —
  * real dual-source wiring goes through [[graft.sources.SideReader]].
  */
object Cli {

  def main(args: Array[String]): Unit = sys.exit(run(args, buildSession()))

  private def buildSession(): SparkSession = {
    val b = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("graft")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
    Tables.sessionConf.foreach { case (k, v) => b.config(k, v) }
    b.getOrCreate()
  }

  /** Dispatch, separated from main for testability. */
  def run(args: Array[String], spark: SparkSession): Int = args.toList match {
    case "discover" :: conf :: dir :: Nil =>
      val c = parseConf(conf)
      val tables = Discover.discover(spark, dir, c.checkSql)
      tables.collect().foreach(r => println(s"${r.getString(0)}\t${r.getString(1)}"))
      0

    case "generate" :: conf :: dir :: runId :: Nil =>
      val c = parseConf(conf)
      Discover.discover(spark, dir, c.checkSql).collect().foreach { r =>
        val (schema, table) = (r.getString(0), r.getString(1))
        val out = java.nio.file.Paths.get(c.outputDir)
        java.nio.file.Files.createDirectories(out)
        java.nio.file.Files.writeString(
          out.resolve(s"${schema}_$table.toml"),
          EngineConf.renderTaskToml(c, schema, table, runId))
        println(s"generated ${schema}_$table.toml")
      }
      0

    case "run-all" :: conf :: dir :: Nil =>
      val c = parseConf(conf)
      // Singleton run lock — the reference's PID-file guard
      // (`run_syncdiff_config.sh:81-93`): a second concurrent run-all
      // against the same output dir exits 3 instead of interleaving
      // artifacts. OS-level file lock, released on JVM exit either way.
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(c.outputDir))
      val lockChannel = java.nio.channels.FileChannel.open(
        java.nio.file.Paths.get(c.outputDir, ".graft.lock"),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE)
      val lock =
        try lockChannel.tryLock()
        catch { // held by THIS JVM (another thread) -> same "busy" answer
          case _: java.nio.channels.OverlappingFileLockException => null
        }
      if (lock == null) {
        System.err.println(
          s"another run-all holds ${c.outputDir}/.graft.lock; exiting")
        lockChannel.close()
        3
      } else try {
        val specs = Tables.primaryKeys.collect {
          case (t, Seq(pk)) if Tables.pkKind(t) == "NONCLUSTERED" =>
            t -> TableDiff.DiffSpec(Seq(pk), pk, c.chunkSize)
        }
        val report = Orchestrate.runAll(spark, dir, c.checkSql,
          (_, up) => up, specs, tableParallelism = c.threadCount,
          structOnly = c.structOnly,
          onProgress = (d, n, pct) => println(s"progress: $d/$n ($pct%)"))
        println(Report.render(report))
        Report.exitCode(report)
      } finally {
        lock.release()
        lockChannel.close()
      }

    case "doctor" :: conf :: dir :: Nil =>
      // preflight in the spirit of the reference's absent-but-documented
      // test_connection.sh (README.md:49-58): config parses, fixture dir
      // readable, check_sql contract holds
      val checks = Seq(
        "config parses" -> scala.util.Try(parseConf(conf)).isSuccess,
        "fixture dir readable" ->
          new java.io.File(s"$dir/orders.parquet").exists(),
        "check_sql contract" -> scala.util.Try {
          Discover.discover(spark, dir, parseConf(conf).checkSql).schema
        }.isSuccess)
      checks.foreach { case (name, ok) =>
        println(f"${if (ok) "PASS" else "FAIL"}%-4s $name")
      }
      if (checks.forall(_._2)) 0 else 1

    case _ =>
      System.err.println(
        "usage: graft.Cli (discover|generate|run-all|doctor) <config.toml> <fixtureDir> [runId]")
      2
  }

  private def parseConf(path: String): EngineConf =
    EngineConf.parse(java.nio.file.Files.readString(java.nio.file.Paths.get(path)))
}
