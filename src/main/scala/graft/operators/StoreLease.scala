package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Single-writer ENFORCEMENT for versioned-store mutations (VERDICT
  * r17 #2). Every mutation path (publish, compact, retrain, delete,
  * prune) documents a single-writer contract — the tombstone novelty
  * check is a read-modify-write, the publish pointer flip assumes one
  * publisher — but prose doesn't stop a second cron job. The reference
  * ships the pattern to copy: the PID-file singleton lock its runner
  * takes before touching shared state (run_syncdiff_config.sh:81-93 —
  * write the PID, check liveness with `ps`, refuse or reclaim). This
  * is that lock, store-scoped and object-store-friendly:
  *
  *  - the lease is a FILE at `<base>/_lease` created with
  *    overwrite=false (atomic where the filesystem offers it — HDFS;
  *    best-effort elsewhere, which is exactly the reference's PID-file
  *    guarantee), holding `pid@host op epochMillis`;
  *  - REENTRANT per process: compactStore → publishIndex →
  *    gcTombstones is one writer, so nested acquisitions ride the
  *    outermost lease (a JVM-level depth map, plus a holder-id match
  *    for belt and braces);
  *  - STALE detection so a crashed writer never bricks the store: a
  *    lease older than [[StaleMillis]] is reclaimed, and a holder on
  *    THIS host whose pid no longer exists (`/proc/<pid>` absent) is
  *    reclaimed immediately — the `ps`-liveness half of the
  *    reference's check, applicable only where the process table is
  *    visible;
  *  - pure READERS never touch it: probes, audits, doctor, and
  *    generation resolution stay lease-free (readers are protected by
  *    generation immutability, not by the lock), and the underscore
  *    prefix keeps the file invisible to any input listing.
  */
object StoreLease {

  val LeaseName = "_lease"

  /** A lease this much older than now is presumed crashed and is
    * reclaimed. Generous on purpose: a legitimate mutation that takes
    * longer holds a lease with a LIVE pid on the same host (never
    * reclaimed there), and cross-host reclaim-under-a-slow-writer is
    * the documented residual risk of any TTL lock — the knob errs
    * toward refusing, the recoverable failure.
    */
  val StaleMillis: Long = 15L * 60L * 1000L

  private lazy val host: String =
    try java.net.InetAddress.getLocalHost.getHostName
    catch { case _: Exception => "unknown-host" }

  private def selfId: String = s"${ProcessHandle.current().pid()}@$host"

  /** Reentrancy depths keyed by the store's qualified URI. */
  private val held = scala.collection.mutable.Map.empty[String, Int]

  private def leasePath(fs: FileSystem, baseDir: String): Path =
    fs.makeQualified(new Path(new Path(baseDir), LeaseName))

  /** (holderId, op, mtimeMillis) of the standing lease, if any. None
    * both when no lease exists AND when it vanished between the
    * existence probe and the read (a releasing holder) — the caller's
    * retry loop treats both as "try the create again".
    */
  def holder(spark: SparkSession, baseDir: String)
      : Option[(String, String, Long)] = {
    val fs = new Path(baseDir).getFileSystem(
      spark.sessionState.newHadoopConf())
    val p = leasePath(fs, baseDir)
    scala.util.Try {
      val st = fs.getFileStatus(p)
      val in = fs.open(p)
      val content =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
        finally in.close()
      val parts = content.split("\\s+")
      (parts.headOption.getOrElse(""),
        parts.drop(1).headOption.getOrElse(""),
        st.getModificationTime)
    }.toOption
  }

  private def pidAliveHere(id: String): Option[Boolean] = {
    val at = id.lastIndexOf('@')
    if (at < 0 || id.substring(at + 1) != host) None
    else if (!new java.io.File("/proc").isDirectory) None
    else scala.util.Try(
      new java.io.File(s"/proc/${id.substring(0, at).toLong}")
        .isDirectory).toOption
  }

  private def tryCreate(fs: FileSystem, p: Path, op: String): Boolean =
    try {
      val out = fs.create(p, false)
      out.write(s"$selfId $op ${System.currentTimeMillis()}\n"
        .getBytes("UTF-8"))
      out.close()
      true
    } catch { case _: java.io.IOException => false }

  /** Run `body` holding the store's writer lease. Refuses — naming the
    * holder — when another LIVE writer holds it; reclaims a stale or
    * dead-pid lease; nests freely within one process.
    */
  def withLease[T](spark: SparkSession, baseDir: String, op: String)
                  (body: => T): T = {
    val fs = new Path(baseDir).getFileSystem(
      spark.sessionState.newHadoopConf())
    val p = leasePath(fs, baseDir)
    val key = p.toString
    val outermost = held.synchronized {
      val d = held.getOrElse(key, 0)
      held(key) = d + 1
      d == 0
    }
    var acquired = false
    try {
      if (outermost) {
        var attempts = 0
        while (!acquired && attempts < 3) {
          attempts += 1
          if (tryCreate(fs, p, op)) acquired = true
          else holder(spark, baseDir) match {
            case None => // holder vanished between create and read: retry
            case Some((id, theirOp, mtime)) =>
              val age = System.currentTimeMillis() - mtime
              val reclaimable = id == selfId ||
                age > StaleMillis || pidAliveHere(id).contains(false)
              if (reclaimable) fs.delete(p, false) // then retry create
              else throw new IllegalStateException(
                s"store at $baseDir is being mutated by $id " +
                  s"($theirOp, lease ${age / 1000}s old at $p) — " +
                  "refusing a concurrent write; if that writer is " +
                  "dead, the lease reclaims after " +
                  s"${StaleMillis / 60000} min (or remove $p)")
          }
        }
        if (!acquired) throw new IllegalStateException(
          s"store at $baseDir: could not acquire the writer lease at " +
            s"$p for $op after 3 attempts against a churning holder")
      }
      body
    } finally {
      held.synchronized {
        val d = held.getOrElse(key, 1) - 1
        if (d <= 0) held.remove(key) else held(key) = d
      }
      if (acquired) fs.delete(p, false)
    }
  }
}
