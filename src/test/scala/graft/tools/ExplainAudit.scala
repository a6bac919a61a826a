package graft.tools

import graft.{Spark, SparkEntry}

/** Dev tool: condensed physical plans for named gate queries (or a
  * default headline set) — the `.explain` audit loop without a REPL.
  *
  * Usage: sbt "Test/runMain graft.tools.ExplainAudit [sfDir] [q1 q2 ...]"
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q1_agg", "q3_join_topk", "e3_asof_join", "t6_corpus_filter",
        "d4_lsh_pairs", "v6_ivf_multiprobe")
    val spark = Spark.session(appName = "graft-explain-audit")
    names.foreach { n =>
      println(s"===== $n =====")
      val plan = SparkEntry.queries(n)(spark, sfDir).queryExecution.executedPlan.toString
      plan.linesIterator
        .map(_.replaceAll("#\\d+L?", "").replaceAll("\\[[^\\]]{60,}\\]", "[..]"))
        .map(l => l.take(120))
        .foreach(println)
      // Exchange census: the stage-count budget at a glance. Shuffles are
      // the scale cost; broadcasts and file scans give the reuse picture
      // (a scan count above the table count means a subplan re-reads).
      def c(re: String) = re.r.findAllIn(plan).size
      println(s"--- exchanges: shuffle=${c("(?m)^\\s*[+:][- ]*Exchange ")} " +
        s"broadcast=${c("BroadcastExchange")} reused=${c("ReusedExchange")} " +
        s"scans=${c("FileScan|BatchScan")} aqe=${c("AdaptiveSparkPlan")}")
    }
    spark.stop()
  }
}
