package graft.tools

import org.apache.spark.sql.functions._

/** Dev dump (VERDICT r19 #3): the per-ROUND physical plan of each
  * iterative graph query (g1/g4/g5/g7/g8), explained BEFORE the round's
  * localCheckpoint truncates it to a leaf — the committed query dumps
  * cannot show the round body. Each block mirrors its query's round
  * code in graft.queries.GraphOps verbatim (same artifacts via the
  * private[graft] builders, same hints); it exists to PROVE the claim
  * "one exchange per relaxation round, edge list never re-exchanged",
  * not to time anything.
  *
  * usage: runMain graft.tools.ProbeGraphRounds <sfDir>
  */
object ProbeGraphRounds {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Spark.session(appName = "graft-probe-graph-rounds")
    import graft.queries.GraphOps

    def section(name: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      println(s"\n=== $name ===")
      df.explain("formatted")
    }

    graft.queries.Materialized.fingerprintScope {
      // --- g1_pagerank: round 2 body (GraphOps.pagerankOf) ---
      {
        val edges = GraphOps.coSupplyEdges(spark, sfDir)
        val bi = edges.union(
          edges.select(col("d2").as("d1"), col("d1").as("d2")))
        val nd = bi.groupBy(col("d1")).agg(count(lit(1)).as("deg"))
          .select(col("d1").as("node"), col("deg"))
          .localCheckpoint(true)
        var rank = nd.select(col("node"), col("deg"),
          lit(1000000000000L).as("r"))
        // one materialized round so the dumped round-2 plan starts from
        // the same checkpointed-leaf state as production rounds 2..5
        def round(r: org.apache.spark.sql.DataFrame) = {
          val contrib = bi
            .join(broadcast(r), col("d1") === col("node"))
            .select(col("d2").as("node"), lit(0L).as("deg"),
              expr("r div deg").as("c"))
          contrib
            .union(nd.select(col("node"), col("deg"), lit(0L).as("c")))
            .groupBy(col("node"))
            .agg(max(col("deg")).as("deg"),
              expr(s"${1000000000000L * 15 / 100} + (17 * sum(c)) div 20")
                .as("r"))
        }
        rank = round(rank).localCheckpoint(false)
        section("g1_pagerank round body")(round(rank))
      }

      // --- g4_bfs: round 2 body ---
      {
        val li = graft.Tables.load(spark, sfDir, "lineitem")
          .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
          .distinct()
        val edges = GraphOps.coPurchFullRawEdges(spark, sfDir)
        val bi = edges.union(
          edges.select(col("d2").as("d1"), col("d1").as("d2")))
        var dist = li.select(col("p")).distinct().filter(col("p") < 3)
          .select(col("p").as("node"), lit(0L).as("dist"))
          .localCheckpoint(true)
        def round(d: org.apache.spark.sql.DataFrame) = {
          val relaxed = bi.join(broadcast(d), col("d1") === col("node"))
            .select(col("d2").as("node"), (col("dist") + 1L).as("dist"))
          d.union(relaxed)
            .groupBy(col("node")).agg(min(col("dist")).as("dist"))
        }
        dist = round(dist).localCheckpoint(true)
        section("g4_bfs round body")(round(dist))
      }

      // --- g5_label_prop: round 2 body (3 fixed rounds share one plan
      //     in production; the round shape is identical) ---
      {
        val edges = GraphOps.coPurchaseEdges3000(spark, sfDir)
        val bi = edges.union(
          edges.select(col("d2").as("d1"), col("d1").as("d2")))
        var lab = bi.select(col("d1")).distinct()
          .select(col("d1").as("node"), col("d1").as("lbl"))
          .localCheckpoint(true)
        def round(l: org.apache.spark.sql.DataFrame) =
          bi.join(broadcast(l), col("d1") === col("node"))
            .groupBy(col("d2"))
            .agg(expr("mode(lbl, true)").as("lbl"))
            .select(col("d2").as("node"), col("lbl"))
        lab = round(lab).localCheckpoint(false)
        section("g5_label_prop round body")(round(lab))
      }

      // --- g7_kcore: round 2 body (peel: two semi-joins + ONE degree
      //     aggregate whose exchange also serves the audit row) ---
      {
        val k = 80
        var e = GraphOps.coPurchaseEdges3000(spark, sfDir)
        def biOf(x: org.apache.spark.sql.DataFrame) =
          x.union(x.select(col("d2").as("d1"), col("d1").as("d2")))
        def degOf(x: org.apache.spark.sql.DataFrame) =
          biOf(x).groupBy(col("d1")).agg(count(lit(1)).as("deg"))
        // round 1 materialized so round 2 starts from its checkpoint
        val keep1 = degOf(e).filter(col("deg") >= k).select(col("d1").as("node"))
        e = e.join(keep1.select(col("node").as("d1")), Seq("d1"), "left_semi")
          .join(keep1.select(col("node").as("d2")), Seq("d2"), "left_semi")
          .select(col("d1"), col("d2"))
          .localCheckpoint(true)
        val deg2 = degOf(e)
        val keep2 = deg2.filter(col("deg") >= k).select(col("d1").as("node"))
        val e2 = e.join(keep2.select(col("node").as("d1")), Seq("d1"), "left_semi")
          .join(keep2.select(col("node").as("d2")), Seq("d2"), "left_semi")
          .select(col("d1"), col("d2"))
        section("g7_kcore round body (peel joins + audit agg)")(
          degOf(e2).agg(count(lit(1)).cast("long").as("n_nodes"),
            expr("coalesce(sum(deg), CAST(0 AS BIGINT)) div 2").as("n_edges")))
      }

      // --- g8_harmonic: round 2 body ---
      {
        val edges = GraphOps.coPurchaseEdges3000(spark, sfDir)
        val bi = edges.union(
          edges.select(col("d2").as("d1"), col("d1").as("d2")))
        var dist = bi.select(col("d1")).distinct().filter(col("d1") < 20)
          .select(col("d1").as("src"), col("d1").as("node"), lit(0L).as("dist"))
          .localCheckpoint(true)
        def round(d: org.apache.spark.sql.DataFrame) = {
          val relaxed = bi.join(broadcast(d), col("d1") === col("node"))
            .select(col("src"), col("d2").as("node"),
              (col("dist") + 1L).as("dist"))
          d.union(relaxed)
            .groupBy(col("src"), col("node")).agg(min(col("dist")).as("dist"))
        }
        dist = round(dist).localCheckpoint(false)
        section("g8_harmonic round body")(round(dist))
      }
    }
    spark.stop()
  }
}
