package graft.io

import java.net.URI
import java.nio.file.Files

import org.apache.hadoop.fs.RawLocalFileSystem
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.Spark
import graft.core.Volume
import graft.io.zarr.{ZarrDataSource, ZarrIO}
import graft.sources.SyntheticStack

/** A `mock://` Hadoop FileSystem backed by the local disk — the standard
  * offline stand-in for an object store's non-default scheme. */
class MockSchemeFs extends RawLocalFileSystem {
  override def getUri: URI = URI.create("mock:///")
}

/** The object-store readiness gate the sandbox allows: no S3 endpoint
  * exists here, but every sink/scan must already work against a
  * NON-DEFAULT FileSystem scheme that is only resolvable through the
  * SESSION's Hadoop configuration (`spark.hadoop.fs.mock.impl`). This
  * fails against two real bug classes:
  *   - any path that assumes `file://`/java.io instead of the Hadoop FS
  *     API breaks on the scheme;
  *   - any path that builds a fresh `new Configuration()` (dropping the
  *     session's `spark.hadoop.*` overlays — exactly where s3a
  *     credentials and `fs.<scheme>.impl` registrations live) cannot
  *     resolve `mock://` AT ALL and dies with "No FileSystem for scheme"
  *     — driver-side or inside an executor task.
  */
class MockSchemeFsSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = Spark.session(master = "local[4]", shufflePartitions = 4,
      appName = "graft-mockfs-test")
    // registration lives ONLY in the session conf — the point of the test
    s.sparkContext.hadoopConfiguration
      .set("fs.mock.impl", classOf[MockSchemeFs].getName)
    s
  }

  test("Zarr metadata + chunk sink + DSv2 read work on a non-default scheme") {
    spark.sparkContext // force session init: mock:// resolves via ITS conf
    val dir = "mock://" + Files.createTempDirectory("zarr-mockfs").toString
    val vol = Volume("mk", 0, Array(1L, 1L, 16L, 16L, 16L), Array(1, 1, 8, 8, 8))

    // driver-side metadata write + executor-side chunk write (ZarrIO)
    ZarrIO.writeMetadata(dir, vol, nLevels = 1)
    ZarrIO.write(SyntheticStack.generate(spark, vol), dir, vol)

    // DSv2 read back through the same scheme, voxel-exact
    val back = spark.read.format(classOf[ZarrDataSource].getName)
      .option("path", dir).option("stack", "mk").option("level", "0").load()
    assert(back.count() == 8)
    val r = back.filter(col("z") === 1 && col("y") === 0 && col("x") === 0).collect()(0)
    val cs = r.getSeq[Int](r.fieldIndex("shape"))
    val px = graft.core.PixelCodec.toInts(r.getAs[Array[Byte]]("data"))
    for (z <- 0 until cs(2); y <- 0 until cs(3); x <- 0 until cs(4))
      assert(px(z * cs(3) * cs(4) + y * cs(4) + x) ==
        SyntheticStack.value(8 + z, y, x), s"voxel ($z,$y,$x)")

    // DSv2 write path (factories ship the session conf to executor tasks)
    spark.read.format(classOf[ZarrDataSource].getName)
      .option("path", dir).option("stack", "mk").option("level", "0").load()
      .write.format(classOf[ZarrDataSource].getName)
      .option("path", dir).option("stack", "mk").mode("overwrite").save()
    assert(spark.read.format(classOf[ZarrDataSource].getName)
      .option("path", dir).option("stack", "mk").option("level", "0")
      .load().count() == 8)
  }

  test("CZI scan reads subblocks through a non-default scheme") {
    spark.sparkContext // force session init: mock:// resolves via ITS conf
    val dir = Files.createTempDirectory("czi-mockfs")
    val local = dir.resolve("mk.czi").toString
    graft.sources.czi.SyntheticCzi.write(local,
      Array.tabulate(4, 8, 8)((z, y, x) => SyntheticStack.value(z, y, x)))
    val path = "mock://" + local
    val (vol, idx) = graft.sources.czi.CziSource.volume(path, "mk", Array(4, 8, 8))
    val chunks = graft.sources.czi.CziSource.scan(spark, path, vol, idx).collect()
    assert(chunks.length == 1)
    val px = chunks(0).pixels
    for (z <- 0 until 4; y <- 0 until 8; x <- 0 until 8)
      assert(px(z * 64 + y * 8 + x) == SyntheticStack.value(z, y, x), s"($z,$y,$x)")
  }
}
