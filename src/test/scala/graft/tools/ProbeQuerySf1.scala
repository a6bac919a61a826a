package graft.tools

import graft.Spark

/** Generic sf1 pass-series probe (the ProbeD2Sf1 / ProbeG1Sf1 pattern
  * without the query-specific diagnostics): run one gated query at the
  * 10x corpus for N within-JVM passes and print each, so any SF1 row
  * whose window looked noisy gets the same spread-pin evidence d2 and
  * g1 carry.
  *
  * usage: Test/runMain graft.tools.ProbeQuerySf1 <query> [sf1Dir] [passes]
  */
object ProbeQuerySf1 {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sf1 = if (args.length > 1) args(1) else "/tmp/graft-sf1"
    val passes = if (args.length > 2) args(2).toInt else 7
    val spark = Spark.session(appName = s"graft-probe-$name")
    sys.props("graft.graph.capScale") = "10"
    val fn = graft.SparkEntry.queries(name)
    val w0 = System.nanoTime(); val rows = fn(spark, sf1).count()
    println(f"""{"probe":"${name}_warm","rows":$rows,"sec":${(System.nanoTime() - w0) / 1e9}%.2f}""")
    val ts = (1 to passes).map { _ =>
      val t0 = System.nanoTime(); fn(spark, sf1).count()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"""{"probe":"${name}_passes","runs":[${ts.map(t => f"$t%.2f").mkString(",")}],""" +
      f""""median":${ts.sorted.apply(ts.size / 2)}%.2f,"min":${ts.min}%.2f,""" +
      f""""max":${ts.max}%.2f,"spread":${ts.max / ts.min}%.2f}""")
    spark.stop()
  }
}
