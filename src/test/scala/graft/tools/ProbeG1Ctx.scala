package graft.tools

import graft.Spark

/** Companion to ProbeG1Sf1: reproduce the REHEARSAL's JVM context
  * (d19, d2, d16 run first, exactly like Sf1Rehearsal's query order)
  * and then time g1 — isolating whether the 26 s SF1-window reading is
  * shared-JVM residue (prior queries' cached blocks / cleaner backlog /
  * JIT state) rather than anything in g1's own plan.
  *
  * usage: Test/runMain graft.tools.ProbeG1Ctx [sf1Dir] [passes]
  */
object ProbeG1Ctx {
  def main(args: Array[String]): Unit = {
    val sf1 = if (args.length > 0) args(0) else "/tmp/graft-sf1"
    val passes = if (args.length > 1) args(1).toInt else 3
    val spark = Spark.session(appName = "graft-probe-g1ctx")
    sys.props("graft.graph.capScale") = "10"
    for (name <- Seq("d19_prefix_join", "d2_ngram_jaccard", "d16_lsh_eval")) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sf1).count()
      println(f"""{"probe":"ctx_prior","q":"$name","sec":${(System.nanoTime() - t0) / 1e9}%.2f}""")
    }
    val fn = graft.SparkEntry.queries("g1_pagerank")
    val w0 = System.nanoTime(); fn(spark, sf1).count()
    println(f"""{"probe":"ctx_g1_warm","sec":${(System.nanoTime() - w0) / 1e9}%.2f}""")
    for (i <- 1 to passes) {
      val t0 = System.nanoTime(); fn(spark, sf1).count()
      println(f"""{"probe":"ctx_g1_pass","i":$i,"sec":${(System.nanoTime() - t0) / 1e9}%.2f}""")
    }
    spark.stop()
  }
}
