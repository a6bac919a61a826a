package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageSubmitted}
import java.util.concurrent.atomic.AtomicInteger

/** Round-15 g1_pagerank pin (VERDICT r14 ask #1, pre-registered in
  * PERF_NOTES before first run): interleaves g1 with the unchanged
  * anchor d2_ngram_jaccard inside one session and records wall, GC
  * time, and per-run job/stage counts. Constant counts + drifting wall
  * = host/window noise; drifting counts = scheduler/block-manager
  * behavior (the r14 "Block rdd_* already exists" lead). Run in three
  * separate JVM windows; outputs committed verbatim.
  */
object ProbeG1 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 4
    val spark = graft.Spark.session(appName = "graft-probe-g1")
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit = stages.incrementAndGet()
    })
    val gcBeans = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
    def gcMs: Long = { var t = 0L; gcBeans.forEach(b => t += b.getCollectionTime); t }
    def once(name: String, i: Int): Double = {
      val fn = graft.SparkEntry.queries(name)
      val (g0, j0, s0) = (gcMs, jobs.get(), stages.get())
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val el = (System.nanoTime() - t0) / 1e9
      // listener events are async (listenerBus is private); a short
      // settle is enough for count deltas on an idle scheduler
      Thread.sleep(200)
      println(f"[probe-g1] $name run$i: $el%.3f s  gc=${gcMs - g0} ms  " +
        f"jobs=${jobs.get() - j0}  stages=${stages.get() - s0}  rows=$n")
      el
    }
    val g1s = Array.newBuilder[Double]
    val d2s = Array.newBuilder[Double]
    for (i <- 1 to reps) {
      d2s += once("d2_ngram_jaccard", i)
      g1s += once("g1_pagerank", i)
    }
    def med(xs: Array[Double]): Double = { val s = xs.sorted; s(s.length / 2) }
    val (mg, md) = (med(g1s.result()), med(d2s.result()))
    println(f"[probe-g1] window medians: g1=$mg%.3f s  d2(anchor)=$md%.3f s  ratio=${mg / md}%.2f")
    spark.stop()
  }
}
