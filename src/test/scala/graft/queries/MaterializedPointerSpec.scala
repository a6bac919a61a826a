package graft.queries

import java.net.URI
import java.nio.file.{Files, StandardOpenOption}
import java.util.concurrent.atomic.AtomicInteger

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path, RawLocalFileSystem}
import org.scalatest.funsuite.AnyFunSuite

import graft.Spark

/** Local stand-in for an object store: non-atomic-rename scheme (not in
  * the atomic list) that CAN create-if-absent. POSIX `CREATE_NEW` is an
  * atomic existence-gated create, exactly the conditional-PUT semantics
  * [[graft.io.AtomicCreate]] specifies. */
class MockObjFs extends RawLocalFileSystem with graft.io.AtomicCreate {
  override def getUri: URI = URI.create("mockobj:///")
  override def createIfAbsent(p: Path, body: Array[Byte]): Boolean =
    try {
      Files.write(java.nio.file.Paths.get(p.toUri.getPath), body,
        StandardOpenOption.CREATE_NEW)
      true
    } catch { case _: java.nio.file.FileAlreadyExistsException => false }
}

/** A scheme that is neither declared atomic-rename nor AtomicCreate —
  * the store class [[Materialized.commitProtocol]] must REFUSE. */
class MockBadFs extends RawLocalFileSystem {
  override def getUri: URI = URI.create("mockbad:///")
}

/** The object-store commit path (VERDICT r17 ask #1): store-class
  * selection, the pointer-commit protocol end-to-end on a
  * create-if-absent scheme, loud refusal of unsound stores, the
  * lost-race loser path (racer's pointer wins, loser's attempt is
  * dropped without stranding a reader), dangling-pointer tamper
  * detection, and crashed-writer garbage being ignored. The REAL
  * two-process race on a live S3 endpoint is [[graft.tools.S3RaceGate]];
  * this spec pins the protocol logic without a server. */
class MaterializedPointerSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = Spark.session(master = "local[4]", shufflePartitions = 4,
      appName = "graft-materialized-pointer-test")
    s.sparkContext.hadoopConfiguration
      .set("fs.mockobj.impl", classOf[MockObjFs].getName)
    s
  }

  private def fsFor(scheme: String): org.apache.hadoop.fs.FileSystem = {
    spark.sparkContext // force init
    val fs = scheme match {
      case "mockobj" => new MockObjFs
      case "mockbad" => new MockBadFs
    }
    fs.initialize(URI.create(s"$scheme:///"), new Configuration())
    fs
  }

  test("commitProtocol: atomic schemes rename, AtomicCreate object stores point, unknown stores refuse loudly") {
    val localFs = new Path("/tmp").getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    assert(Materialized.commitProtocol(localFs) == Materialized.RenameCommit)
    assert(Materialized.commitProtocol(fsFor("mockobj")) == Materialized.PointerCommit)
    val e = intercept[IllegalArgumentException] {
      Materialized.commitProtocol(fsFor("mockbad"))
    }
    assert(e.getMessage.contains("UNSOUND") &&
      e.getMessage.contains("graft.scratch.atomic-rename-schemes"),
      s"refusal must be actionable, got: ${e.getMessage}")
    // operator vouching: a scheme added to the conf list renames
    val vouched = new MockBadFs
    val conf = new Configuration()
    conf.set("graft.scratch.atomic-rename-schemes", "file,hdfs,mockbad")
    vouched.initialize(URI.create("mockbad:///"), conf)
    assert(Materialized.commitProtocol(vouched) == Materialized.RenameCommit)
  }

  test("pointer commit end-to-end: build once, pointer names a complete attempt, warm reuse, value-equal reads") {
    spark.sparkContext
    val root = Files.createTempDirectory("mspec-ptr-root").toString
    graft.Scratch.withRoot("mockobj://" + root) {
      val builds = new AtomicInteger(0)
      def consume(): Long = Materialized.rel(spark, "mspec-ptr-e2e") {
        builds.incrementAndGet()
        spark.range(12).toDF("id")
      }.count()
      assert(consume() == 12 && builds.get() == 1)
      assert(consume() == 12 && builds.get() == 1, "warm reuse through the pointer")
      // committed layout: rel.commit names the ONE attempt dir, which is complete
      val dir = java.nio.file.Paths.get(root).resolve("graft-mv-mspec-ptr-e2e")
      val ptr = dir.resolve("rel.commit")
      assert(Files.exists(ptr), "pointer object must exist")
      val named = new String(Files.readAllBytes(ptr), "UTF-8")
      assert(named.startsWith("rel-attempt-"), s"pointer names the attempt, got '$named'")
      assert(Files.exists(dir.resolve(named).resolve("_SUCCESS")))
      import scala.jdk.CollectionConverters._
      val attempts = Files.list(dir).iterator.asScala
        .map(_.getFileName.toString).filter(_.startsWith("rel-attempt-")).toVector
      assert(attempts == Vector(named), s"exactly the committed attempt remains: $attempts")
      // no rename-protocol artifacts (rel.parquet target / staging / trash)
      val others = Files.list(dir).iterator.asScala.map(_.getFileName.toString)
        .filterNot(n => n == "rel.commit" || n == named).toVector
      assert(others.isEmpty, s"unexpected residue: $others")
    }
  }

  test("lost race: the racer's pointer wins, the loser drops its own attempt, readers follow the pointer") {
    spark.sparkContext
    val root = Files.createTempDirectory("mspec-ptr-race").toString
    graft.Scratch.withRoot("mockobj://" + root) {
      val tag = "mspec-ptr-race"
      // the build closure runs before OUR commit — inject the racing
      // JVM's full commit (attempt + pointer) inside it, so our
      // createIfAbsent must lose and take the loser path
      val rel = Materialized.rel(spark, tag) {
        val dir = graft.Scratch.dir(s"mv-$tag")
        spark.range(5).toDF("id").write.parquet(s"$dir/rel-attempt-racer")
        val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
        assert(fs.asInstanceOf[graft.io.AtomicCreate].createIfAbsent(
          new Path(dir, "rel.commit"), "rel-attempt-racer".getBytes("UTF-8")))
        spark.range(9).toDF("id") // the build this JVM computed — must LOSE
      }
      assert(rel.count() == 5, "the reader must follow the committed pointer, not this JVM's build")
      val dir = java.nio.file.Paths.get(root).resolve(s"graft-mv-$tag")
      assert(new String(Files.readAllBytes(dir.resolve("rel.commit")), "UTF-8")
        == "rel-attempt-racer", "a committed pointer is never overwritten")
      import scala.jdk.CollectionConverters._
      val attempts = Files.list(dir).iterator.asScala
        .map(_.getFileName.toString).filter(_.startsWith("rel-attempt-")).toVector
      assert(attempts == Vector("rel-attempt-racer"),
        s"the loser's never-referenced attempt must be dropped: $attempts")
    }
  }

  test("a dangling pointer (external tampering) fails loudly; crashed-writer garbage attempts are ignored") {
    spark.sparkContext
    val root = Files.createTempDirectory("mspec-ptr-bad").toString
    graft.Scratch.withRoot("mockobj://" + root) {
      // crashed-writer garbage: an attempt dir with junk and NO pointer
      // must not confuse the commit — plant it before the first build
      val tag = "mspec-ptr-garbage"
      val dirG = java.nio.file.Paths.get(root).resolve(s"graft-mv-$tag")
      Files.createDirectories(dirG.resolve("rel-attempt-deadbeef"))
      Files.write(dirG.resolve("rel-attempt-deadbeef").resolve("junk"),
        Array.fill[Byte](16)(7))
      val rel = Materialized.rel(spark, tag) { spark.range(4).toDF("id") }
      assert(rel.count() == 4)
      assert(Files.exists(dirG.resolve("rel-attempt-deadbeef").resolve("junk")),
        "another writer's (possibly in-flight) attempt is never touched")
      // tampering: pointer re-written to name a missing attempt
      Files.write(dirG.resolve("rel.commit"), "rel-attempt-gone".getBytes("UTF-8"))
      val e = intercept[IllegalArgumentException] {
        Materialized.rel(spark, tag) { spark.range(4).toDF("id") }.count()
      }
      assert(e.getMessage.contains("externally modified"), e.getMessage)
    }
  }
}
