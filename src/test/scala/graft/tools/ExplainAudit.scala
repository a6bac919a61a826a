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
      SparkEntry.queries(n)(spark, sfDir).queryExecution.executedPlan.toString
        .linesIterator
        .map(_.replaceAll("#\\d+L?", "").replaceAll("\\[[^\\]]{60,}\\]", "[..]"))
        .map(l => l.take(120))
        .foreach(println)
    }
    spark.stop()
  }
}
