package graft.io.zarr

import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.SparkException
import org.scalatest.funsuite.AnyFunSuite

import graft.Spark
import graft.core.{Volume, ZarrChunk}
import graft.sources.SyntheticStack

/** Injected-failure state for the crash test: local mode shares one JVM,
  * so a static flag reaches the executor thread. `compareAndSet` makes
  * the poison fire on exactly one attempt. */
object ZarrCrashInjector {
  val armed = new AtomicBoolean(false)
}

/** K1's exactly-once claim under FAILURE, not just the happy path
  * (VERDICT r9 ask #6). The tmp+atomic-rename protocol
  * (`ZarrIO.writeChunks`) asserts: a visible chunk file is always a
  * complete chunk (rename is the commit point), a killed attempt leaves
  * at most orphaned `.tmp-*` dot-files that readers never see, and a
  * re-run over the partial state converges to exactly one
  * byte-identical file per chunk — duplicate committers lose the rename
  * race and delete their own tmp. This spec kills a write task
  * mid-partition (after some chunks of the job already committed),
  * plants a crashed attempt's partial tmp by hand, re-runs, and
  * asserts the surviving tree file-for-file and byte-for-byte. */
class ZarrCrashSafetySpec extends AnyFunSuite {

  private lazy val spark = Spark.session(master = "local[4]", shufflePartitions = 4,
    appName = "graft-crash-test")

  private val vol = Volume("ct", 0, Array(1L, 1L, 16L, 16L, 16L), Array(1, 1, 8, 8, 8))

  /** Recursive (relativePath -> bytes) map of VISIBLE files under dir. */
  private def visible(dir: String): Map[String, Seq[Byte]] = {
    val root = Paths.get(dir)
    val s = Files.walk(root)
    try s.filter(Files.isRegularFile(_)).toArray.map(_.asInstanceOf[java.nio.file.Path])
      .filterNot(_.getFileName.toString.startsWith("."))
      .map(p => root.relativize(p).toString -> Files.readAllBytes(p).toSeq)
      .toMap
    finally s.close()
  }

  private def tmps(dir: String): Seq[String] = {
    val root = Paths.get(dir)
    val s = Files.walk(root)
    try s.filter(Files.isRegularFile(_)).toArray.map(_.asInstanceOf[java.nio.file.Path])
      .map(_.getFileName.toString).filter(_.startsWith(".tmp-")).toSeq
    finally s.close()
  }

  test("task killed mid-write + planted partial tmp: re-run converges to exactly-once") {
    import spark.implicits._
    val dir = Files.createTempDirectory("zarr-crash").toString
    val clean = Files.createTempDirectory("zarr-clean").toString
    val l0 = SyntheticStack.generate(spark, vol)

    // the oracle tree: same chunks written once into a clean directory
    ZarrIO.writeChunks(l0, clean)
    val want = visible(clean)
    assert(want.size == 8, s"expected 8 chunk files, got ${want.keySet}")

    // 1. some work already committed before the crash (one whole chunk)
    ZarrIO.writeChunks(l0.filter(c => c.z == 0 && c.y == 0 && c.x == 0), dir)
    assert(visible(dir).size == 1)

    // 2. a crashed attempt's PARTIAL tmp in a chunk directory: garbage
    //    bytes under a .tmp- name — exactly what dying after write() but
    //    before rename() leaves behind
    val crashDir = Paths.get(dir, "ct", "0", "0", "0", "0", "0")
    Files.createDirectories(crashDir)
    Files.write(crashDir.resolve(".tmp-1-crashed-attempt"), Array[Byte](1, 2, 3))

    // 3. a write attempt whose task dies mid-partition: the poison chunk
    //    throws while earlier elements of the same task may already have
    //    committed (per-element commit, no output buffering)
    ZarrCrashInjector.armed.set(true)
    val poisoned = l0.map { ck =>
      if (ck.z == 1 && ck.y == 1 && ck.x == 1 &&
          ZarrCrashInjector.armed.compareAndSet(true, false))
        throw new RuntimeException("injected mid-write crash")
      ck
    }
    intercept[SparkException] { ZarrIO.writeChunks(poisoned, dir) }

    // invariant even in the wreckage: every VISIBLE file is a complete,
    // byte-correct chunk — partial state can only ever wear a tmp name
    visible(dir).foreach { case (rel, bytes) =>
      assert(want(rel) == bytes, s"visible file $rel is not a complete chunk")
    }

    // 4. recovery: sweep orphans, re-run the WHOLE job (the production
    //    retry — no bookkeeping of what committed).
    //    Age threshold first: with minAgeMs = 1h every tmp here is
    //    "too fresh" (possibly a live writer's) and must survive — the
    //    guard a caller uses when it can't rule out a concurrent job.
    val sweptNone = ZarrIO.cleanupTmp(dir,
      spark.sparkContext.hadoopConfiguration, minAgeMs = 3600000L)
    assert(sweptNone == 0L, "age-gated sweep deleted a fresh tmp")
    assert(tmps(dir).nonEmpty)
    val swept = ZarrIO.cleanupTmp(dir, spark.sparkContext.hadoopConfiguration)
    assert(swept >= 1, "planted tmp was not swept")
    assert(tmps(dir).isEmpty)
    ZarrIO.writeChunks(l0, dir)

    // exactly-once: file set and bytes identical to the clean write —
    // no partials, no duplicates, no stray names
    assert(visible(dir) == want)
    assert(tmps(dir).isEmpty, "re-run left tmp files behind")
  }

  test("duplicate committers (speculative twin): rename race leaves one file per chunk") {
    val dir = Files.createTempDirectory("zarr-dup").toString
    val clean = Files.createTempDirectory("zarr-dup-clean").toString
    val l0 = SyntheticStack.generate(spark, vol)
    ZarrIO.writeChunks(l0, clean)
    // two full committers over the same root — the second loses every
    // rename (dst exists) and must delete its own tmp, not corrupt dst
    ZarrIO.writeChunks(l0, dir)
    ZarrIO.writeChunks(l0, dir)
    assert(visible(dir) == visible(clean))
    assert(tmps(dir).isEmpty, "losing committer left its tmp behind")
  }
}
