package graft.tools

import scala.jdk.CollectionConverters._

import graft.Spark

/** g1_pagerank sf1 cross-JVM swing census: SF1.json records spark
  * medians of 15.8 / 20.3 / 26.2 s across three same-day windows with
  * TIGHT within-window spread — so whatever moves is per-JVM state, not
  * per-run noise. This probe runs g1 at sf1 for several passes in one
  * JVM and prints, per pass: wall seconds, GC time delta (all
  * collectors), heap used after the pass, and the block-manager storage
  * footprint (g1 eagerly localCheckpoints its ~10x edge relation — if
  * the blocks are memory-tight, eviction forces the 100M-pair join to
  * recompute inside later rounds, which is exactly a 1.5x-wall
  * mechanism). Launch it 2-3 times (fresh JVMs) to see whether the
  * cross-JVM spread correlates with GC share or storage eviction.
  *
  * usage: Test/runMain graft.tools.ProbeG1Sf1 [sf1Dir] [passes]
  */
object ProbeG1Sf1 {
  def main(args: Array[String]): Unit = {
    val sf1 = if (args.length > 0) args(0) else "/tmp/graft-sf1"
    val passes = if (args.length > 1) args(1).toInt else 5
    val spark = Spark.session(appName = "graft-probe-g1")
    sys.props("graft.graph.capScale") = "10"
    val fn = graft.SparkEntry.queries("g1_pagerank")
    val gcBeans = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
    def gcMs: Long = gcBeans.map(_.getCollectionTime).sum
    val rt = Runtime.getRuntime
    println(s"""{"probe":"g1_env","heap_max_mb":${rt.maxMemory() / (1 << 20)},""" +
      s""""cpus":${rt.availableProcessors()}}""")
    val warm = { val t0 = System.nanoTime(); val n = fn(spark, sf1).count()
      (n, (System.nanoTime() - t0) / 1e9) }
    println(f"""{"probe":"g1_warm","rows":${warm._1},"sec":${warm._2}%.2f}""")
    for (i <- 1 to passes) {
      val g0 = gcMs
      val t0 = System.nanoTime()
      fn(spark, sf1).count()
      val sec = (System.nanoTime() - t0) / 1e9
      val gc = gcMs - g0
      val heapMb = (rt.totalMemory() - rt.freeMemory()) / (1 << 20)
      val storage = spark.sparkContext.getRDDStorageInfo
      val memMb = storage.map(_.memSize).sum / (1 << 20)
      val diskMb = storage.map(_.diskSize).sum / (1 << 20)
      val cachedFrac =
        if (storage.isEmpty) 1.0
        else storage.map(r => r.numCachedPartitions.toDouble / math.max(1, r.numPartitions)).min
      println(f"""{"probe":"g1_pass","i":$i,"sec":$sec%.2f,"gc_ms":$gc,""" +
        f""""gc_share":${gc / 1000.0 / sec}%.2f,"heap_used_mb":$heapMb,""" +
        f""""ckpt_mem_mb":$memMb,"ckpt_disk_mb":$diskMb,"min_cached_frac":$cachedFrac%.2f,""" +
        f""""n_cached_rdds":${storage.length}}""")
    }
    spark.stop()
  }
}
