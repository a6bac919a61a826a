package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Spark
import graft.queries.Materialized

/** A/B probe for g4_bfs (VERDICT r15 ask #3): at 1.33 s / 2.0x it is
  * the last >=1 s bench row without a dedicated census. The gate query
  * runs 4 relaxation rounds, each ending in `localCheckpoint(false)`
  * because `dist` has TWO consumers per round (the union arm and the
  * broadcast-join arm) — the g7 fan-out that defeats exchange reuse.
  * The g5 lesson (r14: dropping per-round checkpoints won 1.24 ->
  * 1.03 s) says bounded rounds may fuse into ONE adaptive plan; the g7
  * lesson (fused REJECTED, 9.47 s recompute explosion) says fan-out
  * rounds may not. g4 sits between them: its per-round fan-out is real,
  * but both consumers sit ABOVE the round's min-aggregate exchange, so
  * runtime shuffle-stage reuse could carry it. Variants (values
  * asserted equal to the gate before any timing is trusted):
  *
  *   - g4_fused — no per-round checkpoint: one adaptive plan, 4 rounds
  *     deep, relying on exchange reuse to dedup the doubled lineage;
  *   - g4_eager — per-round EAGER checkpoint (compute now, truncate
  *     lineage): isolates whether the gate's lazy variant loses time
  *     re-entering the lineage on first action.
  *
  * All variants read the SAME Materialized edge artifact as the gate
  * (built on first touch), so the probe isolates round structure, not
  * input cost.
  *
  * Usage: sbt "Test/runMain graft.tools.ProbeG4 [sfDir] [runs]"
  *
  * MEASURED (this round, sf0.1, local[32], 5 runs — see PERF_NOTES):
  * the per-round checkpoint is LOAD-BEARING; fused explodes like g7.
  */
object ProbeG4 {

  private def edges(s: SparkSession, dir: String): DataFrame = {
    val capScale = sys.props.getOrElse("graft.graph.capScale", "1").toLong
    // same tag as GraphOps.g4_bfs => reuses the gate's artifact
    Materialized.rel(s,
        s"copurch-full-raw-${Materialized.dirTag(s, dir)}-$capScale") {
      val li = graft.Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .repartition(col("o")).distinct()
      li.as("a").join(li.as("b"),
          col("a.o") === col("b.o") && col("a.p") < col("b.p"))
        .select(col("a.p").as("d1"), col("b.p").as("d2"))
    }
  }

  private def seed(s: SparkSession, dir: String): DataFrame =
    graft.Tables.load(s, dir, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct()
      .select(col("p")).distinct().filter(col("p") < 3)
      .select(col("p").as("node"), lit(0L).as("dist"))
      .localCheckpoint(true)

  private def rounds(s: SparkSession, dir: String,
                     seal: DataFrame => DataFrame): DataFrame = {
    val e = edges(s, dir)
    val bi = e.union(e.select(col("d2").as("d1"), col("d1").as("d2")))
    var dist = seed(s, dir)
    for (_ <- 1 to 4) {
      val relaxed = bi.join(broadcast(dist), col("d1") === col("node"))
        .select(col("d2").as("node"), (col("dist") + 1L).as("dist"))
      dist = seal(dist.union(relaxed)
        .groupBy(col("node")).agg(min(col("dist")).as("dist")))
    }
    dist.groupBy(col("dist")).agg(count(lit(1)).as("n_nodes"))
      .orderBy(col("dist"))
  }

  private def g4Fused(s: SparkSession, dir: String): DataFrame =
    rounds(s, dir, identity)

  private def g4Eager(s: SparkSession, dir: String): DataFrame =
    rounds(s, dir, _.localCheckpoint(true))

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = if (args.length > 1) args(1).toInt else 5
    val spark = Spark.session(appName = "graft-probe-g4")

    val gate = graft.SparkEntry.queries("g4_bfs")
    val variants: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      ("g4_fused", g4Fused), ("g4_eager", g4Eager))

    val a = gate(spark, dir).collect().map(_.toString).sorted.toSeq
    variants.foreach { case (name, fn) =>
      val b = fn(spark, dir).collect().map(_.toString).sorted.toSeq
      require(a == b, s"$name != g4_bfs:\n gate=${a.take(3)}\n variant=${b.take(3)}")
    }

    def time(f: (SparkSession, String) => DataFrame): Seq[Double] = {
      f(spark, dir).count() // warm
      (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        f(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
    }
    def med(x: Seq[Double]) = x.sorted.apply(x.size / 2)
    (("g4_gate", gate) +: variants).foreach { case (name, fn) =>
      val ts = time(fn)
      println(f"[probe] $name%-10s med=${med(ts)}%.2fs " +
        ts.map(t => f"$t%.2f").mkString("[", ",", "]") + "  values_equal=true")
    }
    spark.stop()
  }
}
