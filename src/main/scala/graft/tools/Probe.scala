package graft.tools

/** Ad-hoc repeat-timer for chasing run-to-run variance (dev tool). */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val name = if (args.length > 1) args(1) else "d2_ngram_jaccard"
    val reps = if (args.length > 2) args(2).toInt else 6
    val spark = graft.Spark.session(appName = "graft-probe")
    val fn = graft.SparkEntry.queries(name)
    val gcBeans = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
    def gcMs: Long = {
      var t = 0L; gcBeans.forEach(b => t += b.getCollectionTime); t
    }
    for (i <- 1 to reps) {
      val g0 = gcMs
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val el = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $name run$i: $el%.3f s  gc=${gcMs - g0} ms  rows=$n")
    }
    spark.stop()
  }
}
