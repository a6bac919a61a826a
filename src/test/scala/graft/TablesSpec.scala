package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** The plan cache's lifecycle hooks: invalidate(dir) must drop cached
  * plans and view registrations so a mutated directory is re-read. */
class TablesSpec extends AnyFunSuite {

  private lazy val spark = Spark.session(master = "local[2]", shufflePartitions = 2,
    appName = "graft-tables-test")

  test("invalidate(dir) drops the cached FileIndex snapshot for that dir") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tables-inv").toString
    Seq((1L, "a")).toDF("r_regionkey", "r_name")
      .write.mode("overwrite").parquet(s"$dir/region.parquet")
    assert(Tables.load(spark, dir, "region").count() == 1)

    // mutate the data under the dir: the cached snapshot would serve the
    // stale listing without an invalidate
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("r_regionkey", "r_name")
      .write.mode("overwrite").parquet(s"$dir/region.parquet")
    Tables.invalidate(dir)
    assert(Tables.load(spark, dir, "region").count() == 3)
  }

  test("fanout on a non-canonical frame computes uncached instead of crashing") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tables-fan").toString
    Seq((1L, "x"), (2L, "y")).toDF("r_regionkey", "r_name")
      .write.mode("overwrite").parquet(s"$dir/region.parquet")
    val held = Tables.load(spark, dir, "region")
    // evicting the canonical entry makes `held` non-canonical — the
    // documented escape hatch a caller may legitimately hold a frame
    // across; fanout must degrade to an uncached computation, not throw
    Tables.invalidate(dir)
    assert(Tables.fanout(held).count() == 2)
    // and the canonical path still caches: two calls return one instance
    val canon = Tables.load(spark, dir, "region")
    assert(Tables.fanout(canon) eq Tables.fanout(canon))
  }
}
