package graft

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

/** Per-JVM scratch directories for queries that synthesize their own
  * stores (the z* gate queries). One directory per tag, reused across
  * invocations — Bench runs every query twice per round, and repeated
  * rounds previously accumulated unbounded copies under /tmp. All
  * scratch roots are removed by a shutdown hook.
  */
object Scratch {
  private val dirs = new java.util.concurrent.ConcurrentHashMap[String, String]()

  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    dirs.values.forEach(d => deleteRecursively(Paths.get(d)))
  }))

  /** The per-JVM scratch dir for `tag` (created on first use). Writers
    * into it must be idempotent — the same tag returns the same path for
    * the lifetime of the JVM. */
  def dir(tag: String): String =
    dirs.computeIfAbsent(tag, t => Files.createTempDirectory(s"graft-$t").toString)

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try walk.sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.deleteIfExists(f))
      finally walk.close()
    }
}
