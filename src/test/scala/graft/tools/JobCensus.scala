package graft.tools

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}

import graft.{Spark, SparkEntry}

/** Dev tool: RUNTIME census of named gate queries — jobs, stages, tasks,
  * shuffle bytes — via a SparkListener. The static `ExplainAudit` cannot
  * see work hidden behind `localCheckpoint` leaves (every iterative graph
  * query executes most of its stages eagerly at query-construction time),
  * so the irreducibility argument for multi-round queries needs this view:
  * `floor cost >= jobs * ~60ms + stages * ~100ms` (PERF_NOTES "The floor,
  * quantified") compared against the measured wall time.
  *
  * Usage: sbt "Test/runMain graft.tools.JobCensus [sfDir] [q1 q2 ...]"
  */
object JobCensus {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    // "ALL" censuses the whole gate surface — the ranking input for the
    // sf1 scale-correctness query selection (shuffle bytes = data-bound)
    val names = if (args.length > 1 && args(1) == "ALL")
        SparkEntry.queries.keys.toSeq.sorted
      else if (args.length > 1) args.drop(1).toSeq
      else Seq("g2_edge_weights", "g3_triangles", "g4_bfs", "g5_label_prop",
        "g6_assortativity", "g7_kcore", "g8_harmonic", "g9_two_hop")
    val spark = Spark.session(appName = "graft-job-census")

    val jobs = new AtomicInteger; val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val shufW = new AtomicLong; val shufR = new AtomicLong
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(s.stageInfo.numTasks)
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          shufW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          shufR.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    println(f"${"query"}%-20s ${"sec"}%7s ${"jobs"}%5s ${"stages"}%7s ${"tasks"}%6s ${"shufW_MB"}%9s ${"shufR_MB"}%9s  floor_est")
    names.foreach { n =>
      // warm-up pass: JIT + parquet footer caches, matching Bench's
      // steady-state measurement discipline
      SparkEntry.queries(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
      Thread.sleep(400) // let the async listener bus drain
      jobs.set(0); stages.set(0); tasks.set(0); shufW.set(0); shufR.set(0)
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(400) // let the async listener bus drain
      val floor = jobs.get * 0.06 + stages.get * 0.10
      println(f"$n%-20s $sec%7.3f ${jobs.get}%5d ${stages.get}%7d ${tasks.get}%6d ${shufW.get / 1e6}%9.1f ${shufR.get / 1e6}%9.1f  ${floor}%.2f")
    }
    spark.stop()
  }
}
