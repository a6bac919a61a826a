package graft.tools

import org.apache.spark.sql.functions._

import graft.Spark
import graft.queries.Materialized

/** One arm of the REAL two-process Materialized commit race
  * ([[RaceGate]] forks two of these against one shared persistent
  * scratch root — VERDICT r16 ask #1: the cross-JVM staging+rename
  * protocol had only ever been exercised in-process, where the per-tag
  * JVM lock serializes everything and the rename contention never
  * actually fires).
  *
  * Protocol: start a small Spark session, print `RACE_READY <id>`, spin
  * on the barrier file (so both JVMs — whose startup times vary by
  * seconds — enter the build within ~50 ms of each other), then drive
  * ONE Materialized build of a deterministic relation and report what
  * this process observed:
  *
  * {{{ RACE_RESULT id=<id> built=<0|1> rows=<n> sum=<s> }}}
  *
  * The persistent root arrives via `-Dgraft.scratch.root` (exactly how
  * a cluster deployment points two driver JVMs at one shared FS cache).
  * `built=1` means THIS JVM ran the build closure; in a two-process
  * first-touch race both normally build and exactly one commit wins —
  * the gate asserts both readers still see value-equal, complete data.
  */
object RaceWriter {
  /** Deterministic build: 3 explicitly-sized part files (user-specified
    * repartition is exempt from AQE coalescing), so the gate can assert
    * the committed artifact is exactly ONE writer's file set. */
  val Rows = 20000L
  def expectedSum: Long =
    (0L until Rows).map(id => (id * 2654435761L) % 1000003L).sum

  def main(args: Array[String]): Unit = {
    val tag = args(0)
    val barrier = java.nio.file.Paths.get(args(1))
    val id = args(2)
    require(sys.props.get("graft.scratch.root").exists(_.nonEmpty),
      "RaceWriter requires -Dgraft.scratch.root (the shared persistent root under test)")
    val spark = Spark.session(master = "local[3]", shufflePartitions = 3,
      appName = s"graft-race-writer-$id")
    spark.sparkContext // force init before READY
    println(s"RACE_READY $id")
    System.out.flush()
    val deadline = System.nanoTime() + 120L * 1000000000L
    while (!java.nio.file.Files.exists(barrier)) {
      require(System.nanoTime() < deadline, s"writer $id: barrier never appeared")
      Thread.sleep(50)
    }
    val rel = Materialized.rel(spark, tag) {
      // overlap window: both JVMs should be INSIDE the build when the
      // first one reaches the commit, so the rename contention is real
      Thread.sleep(300)
      spark.range(Rows)
        .selectExpr("id", "(id * 2654435761L) % 1000003L AS h")
        .repartition(3, col("id"))
    }
    val row = rel.agg(count(lit(1)), sum(col("h"))).collect()(0)
    val built = if (Materialized.buildLog.exists(_.tag == tag)) 1 else 0
    println(s"RACE_RESULT id=$id built=$built rows=${row.getLong(0)} sum=${row.getLong(1)}")
    System.out.flush()
    spark.stop()
  }
}
