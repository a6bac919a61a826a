package graft

import org.scalatest.funsuite.AnyFunSuite

/** Randomized gate for g4's round-11 `dedupPairs = false` claim: min-dist
  * relaxation is invariant under edge MULTIPLICITY, so skipping the pair
  * distinct in the edge build cannot change the result. The corpus is
  * built to make multiplicity real — part pairs co-occur in SEVERAL
  * orders, so the raw pair stream g4 now consumes carries genuine
  * duplicates — and the gate query's output must equal a plain-Scala
  * simulation of the contract: 4 rounds of min-dist relaxation over the
  * DISTINCT co-purchase graph from sources p < 3, then the (dist ->
  * n_nodes) histogram. */
class BfsMultiplicityPropertySpec extends AnyFunSuite {

  private lazy val spark = Spark.session(master = "local[4]",
    shufflePartitions = 4, appName = "graft-bfs-prop")

  test("g4 over a duplicate-heavy corpus equals the distinct-graph simulation") {
    import spark.implicits._
    for (seed <- Seq(71L, 72L)) {
      val rnd = new scala.util.Random(seed)
      // 60 parts, 120 orders of 2-4 parts each; order contents drawn from
      // a SMALL pool of part-groups so the same pair recurs across many
      // orders (multiplicity >> 1 by construction)
      val groups = Vector.fill(15)(
        Vector.fill(2 + rnd.nextInt(3))(rnd.nextInt(60).toLong).distinct)
      val li: Seq[(Long, Long)] = (0 until 120).flatMap { o =>
        groups(rnd.nextInt(groups.size)).map(p => (o.toLong, p))
      }
      val dir = java.nio.file.Files.createTempDirectory("bfs-prop").toString
      li.toDF("l_orderkey", "l_partkey")
        .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")

      // multiplicity is REAL in this corpus, not hypothetical
      val rawPairs = li.groupBy(_._1).values.flatMap { ps =>
        val u = ps.map(_._2).distinct.sorted
        for (i <- u.indices; j <- (i + 1) until u.size) yield (u(i), u(j))
      }.toSeq
      val multi = rawPairs.groupBy(identity).values.map(_.size).max
      assert(multi >= 2, s"seed=$seed: corpus failed to produce duplicate pairs")

      val got = SparkEntry.queries("g4_bfs")(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted

      // plain-Scala contract: DISTINCT undirected graph, 4 relaxations
      val edges = rawPairs.distinct
      val adj = (edges ++ edges.map(_.swap))
        .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      val parts = li.map(_._2).distinct
      var dist: Map[Long, Long] = parts.filter(_ < 3).map(_ -> 0L).toMap
      for (_ <- 1 to 4) {
        val relaxed = dist.toSeq.flatMap { case (n, d) =>
          adj.getOrElse(n, Nil).map(_ -> (d + 1)) }
        dist = (dist.toSeq ++ relaxed).groupBy(_._1)
          .view.mapValues(_.map(_._2).min).toMap
      }
      val want = dist.values.groupBy(identity)
        .map { case (d, xs) => (d, xs.size.toLong) }.toSeq.sorted
      assert(got == want, s"seed=$seed: g4 != simulation (max multiplicity $multi)")
    }
  }
}
