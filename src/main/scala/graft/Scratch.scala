package graft

import java.nio.file.{Files, Path}

/** Per-JVM scratch root for queries that round-trip through the local
  * filesystem (summary/TSV/log artifacts, the materialized shingle
  * relation). Everything lives under ONE `graft_scratch_*` directory
  * that a shutdown hook deletes recursively, so repeated bench/verify
  * invocations no longer accumulate orphaned `graft_*` trees in
  * java.io.tmpdir (one leaked tree per query per rep per SF before).
  */
object Scratch {

  private lazy val root: Path = {
    val p = Files.createTempDirectory("graft_scratch_")
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteTree(p)))
    p
  }

  /** Fresh subdirectory under the session scratch root. */
  def dir(prefix: String): String =
    Files.createTempDirectory(root, prefix).toString

  /** Fresh file under the session scratch root. */
  def file(prefix: String, suffix: String): Path =
    Files.createTempFile(root, prefix, suffix)

  private def deleteTree(p: Path): Unit = {
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try {
        walk.sorted(java.util.Comparator.reverseOrder[Path]())
          .forEach(f => { val _ = Files.deleteIfExists(f) })
      } finally walk.close()
    }
  }
}
