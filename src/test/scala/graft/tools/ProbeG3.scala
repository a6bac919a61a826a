package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev A/B: the g3/g10 shared triangle machinery under each combination
  * of its two eager checkpoints — the edge list (`coPurchaseEdgesP`) and
  * the degree-oriented edge relation inside `triangleCounts` — vs the
  * checkpoint-free adaptive plan. The d19 lesson: checkpoint-vs-exchange-
  * reuse must be MEASURED, not assumed; the orientation relation's
  * consumers may share one exchange. Times all four variants warmed,
  * asserts identical full `triangleCounts` output (g3 and g10 are
  * deterministic projections of it). Not part of the gate.
  */
object ProbeG3 {
  private def tri(s: SparkSession, dir: String,
      eCk: Boolean, dCk: Boolean): DataFrame =
    graft.queries.GraphOps.triangleCounts(
      graft.queries.GraphOps.coPurchaseEdgesP(s, dir, cap = 4000, ckpt = eCk),
      ckptOriented = dCk)
      .orderBy(col("n"))

  /** Alternative machinery: adjacency-array intersect (g9's packed-array
    * idea applied to triangles). Build each node's sorted out-neighbor
    * array once, then each oriented edge (u,v) explodes
    * array_intersect(N+(u), N+(v)) — ONLY real triangles materialize,
    * never the wedge relation. Same per-node participation counts. */
  private def triIntersect(s: SparkSession, dir: String,
      eCk: Boolean, dCk: Boolean): DataFrame = {
    val e = graft.queries.GraphOps.coPurchaseEdgesP(s, dir, cap = 4000, ckpt = eCk)
    val deg = e.select(col("p1").as("n")).union(e.select(col("p2").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("dg"))
    val lower = struct(col("g1.dg"), col("p1")) < struct(col("g2.dg"), col("p2"))
    val d0 = e.join(deg.as("g1"), col("p1") === col("g1.n"))
      .join(deg.as("g2"), col("p2") === col("g2.n"))
      .select(when(lower, col("p1")).otherwise(col("p2")).as("src"),
        when(lower, col("p2")).otherwise(col("p1")).as("dst"))
    val d = if (dCk) d0.localCheckpoint(true) else d0
    val adj = d.groupBy(col("src")).agg(sort_array(collect_set(col("dst"))).as("nb"))
    val tri = d
      .join(adj.select(col("src"), col("nb").as("nb_s")), Seq("src"))
      .join(adj.select(col("src").as("dst"), col("nb").as("nb_d")), Seq("dst"))
      .select(col("src").as("ta"), col("dst").as("tb"),
        explode(array_intersect(col("nb_s"), col("nb_d"))).as("tc"))
    val tcnt = tri.select(col("ta").as("n"))
      .union(tri.select(col("tb"))).union(tri.select(col("tc")))
      .groupBy(col("n")).agg(count(lit(1)).as("n_triangles"))
    deg.join(tcnt, Seq("n"), "left")
      .select(col("n"), col("dg"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
      .orderBy(col("n"))
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = graft.Spark.session(appName = "probe-g3")
    val variants = Seq(
      ("e+d ckpt (current)", true, true),
      ("e ckpt only       ", true, false),
      ("d ckpt only       ", false, true),
      ("checkpoint-free   ", false, false))
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val fns: Seq[(String, () => DataFrame)] =
      variants.map { case (name, e, d) =>
        (name, () => tri(spark, dir, e, d)) } ++ Seq(
        ("isect e ckpt      ", () => triIntersect(spark, dir, eCk = true, dCk = false)),
        ("isect e+d ckpt    ", () => triIntersect(spark, dir, eCk = true, dCk = true)),
        ("isect no ckpt     ", () => triIntersect(spark, dir, eCk = false, dCk = false)))
    // warm all variants (codegen + parquet footers), then time interleaved
    fns.foreach { case (_, f) => f().collect() }
    val times = (1 to reps).flatMap { _ =>
      fns.map { case (name, f) => name -> time(f().collect()) }
    }.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    fns.foreach { case (name, _) =>
      val ts = times(name)
      println(f"[probe-g3] $name: ${ts.map(t => f"$t%.2f").mkString(" ")}  min=${ts.min}%.2f  med=${ts.sorted.apply(ts.size / 2)}%.2f")
    }
    val ref = tri(spark, dir, eCk = true, dCk = true).collect().map(_.toString).toSeq
    val same = fns.forall { case (name, f) =>
      val ok = f().collect().map(_.toString).toSeq == ref
      if (!ok) println(s"[probe-g3] MISMATCH: $name")
      ok
    }
    println(s"[probe-g3] identical across variants: $same")
    spark.stop()
  }
}
