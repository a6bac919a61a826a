package graft

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

/** Per-JVM scratch directories for queries that synthesize their own
  * stores (the z* gate queries) and for the shared materialized
  * relations ([[graft.queries.Materialized]]). One directory per tag,
  * reused across invocations — Bench runs every query twice per round,
  * and repeated rounds previously accumulated unbounded copies under
  * /tmp. Temp-rooted scratch is removed by a shutdown hook.
  *
  * Deployment root: by default every dir is a fresh per-JVM temp dir
  * (hermetic — tests, bench, and verify can never see a stale artifact).
  * Setting `SPARK_GRAFT_SCRATCH_ROOT` (env) or `graft.scratch.root`
  * (system property, which wins) points scratch at a PERSISTENT
  * location — on a cluster, a locally-mounted shared filesystem
  * (NFS/Lustre-class; [[graft.queries.Materialized]] probes completeness
  * with local-file `_SUCCESS` checks, so an HDFS/S3 URI is not a valid
  * root) — so materialized relations survive across driver JVMs instead
  * of rebuilding per session: the contract Materialized's scaladoc
  * promises. Persistent
  * dirs are NOT deleted on shutdown; the root is an operator-managed
  * cache keyed by corpus path+hash (see [[graft.queries.Materialized.dirTag]]),
  * so distinct corpora never alias, but a corpus mutated IN PLACE under
  * the same path requires clearing the root (standard materialized-view
  * staleness semantics). Concurrent writers across JVMs are idempotent
  * same-plan writers racing to identical bytes; the `_SUCCESS` marker
  * still gates readers on a complete write.
  */
object Scratch {
  private val dirs = new java.util.concurrent.ConcurrentHashMap[String, String]()
  // temp-rooted dirs only: persistent dirs must survive shutdown, and a
  // JVM can hold both kinds (a test flips the property mid-run), so the
  // mode is recorded per dir at creation, not re-read at shutdown
  private val tempDirs = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    tempDirs.forEach(d => deleteRecursively(Paths.get(d)))
  }))

  /** The persistent root, if configured (system property wins over env
    * so a test JVM can redirect itself without touching the process
    * environment). Read per call: cheap, and lets one JVM's suites
    * exercise both modes. */
  private def persistentRoot: Option[String] =
    sys.props.get("graft.scratch.root")
      .orElse(sys.env.get("SPARK_GRAFT_SCRATCH_ROOT"))
      .filter(_.nonEmpty)

  /** The scratch dir for `tag` (created on first use). Writers into it
    * must be idempotent — the same tag returns the same path for the
    * lifetime of the JVM (temp root) or of the persistent root. */
  def dir(tag: String): String =
    dirs.computeIfAbsent(tag, t => persistentRoot match {
      case Some(root) =>
        val p = Paths.get(root, s"graft-$t")
        Files.createDirectories(p)
        p.toString
      case None =>
        val p = Files.createTempDirectory(s"graft-$t").toString
        tempDirs.add(p)
        p
    })

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try walk.sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.deleteIfExists(f))
      finally walk.close()
    }
}
