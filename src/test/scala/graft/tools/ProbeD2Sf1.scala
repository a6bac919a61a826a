package graft.tools

import org.apache.spark.sql.functions._

import graft.Spark

/** d2_ngram_jaccard sf1 spread pin (VERDICT r11 ask #3): r11's SF1
  * passes read 5.69/8.47/12.49 s WITHIN one JVM — too wide to wave off
  * as host noise without measurement. Two diagnostics:
  *
  *  1. Shingle-bucket histogram at base SF vs the 10x corpus. The
  *     disjoint-copy scale-up suffixes every token per copy, so each
  *     base shingle becomes k distinct shingles at the base frequency:
  *     if the construction holds, max/percentile bucket sizes are
  *     IDENTICAL across scales and total pair work sum(f*(f-1)/2)
  *     scales exactly k-fold — i.e. no hot-bucket regime shift exists
  *     at 10x, and any spread is execution noise, not skew.
  *  2. A longer within-JVM pass series (default 7) of the gated d2
  *     plan at sf1, printed per pass, so the spread claim rests on 7
  *     points in one window instead of 3.
  *
  * usage: Test/runMain graft.tools.ProbeD2Sf1 [sf01Dir] [sf1Dir] [passes]
  */
object ProbeD2Sf1 {
  def main(args: Array[String]): Unit = {
    val sf01 = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val sf1 = if (args.length > 1) args(1) else "/tmp/graft-sf1"
    val passes = if (args.length > 2) args(2).toInt else 7
    val spark = Spark.session(appName = "graft-probe-d2")

    for ((label, dir) <- Seq("sf0.1" -> sf01, "sf1" -> sf1)) {
      // the d2 shingle relation verbatim: distinct word-3-gram hashes
      val sh = graft.Tables.load(spark, dir, "documents")
        .select(col("doc_id"), explode(expr("word_shingle_hashes(text, 3)")).as("h"))
        .distinct()
      val buckets = sh.groupBy(col("h")).agg(count(lit(1)).as("f"))
      val stats = buckets.agg(
        count(lit(1)).as("n_buckets"),
        max(col("f")).as("max_f"),
        expr("percentile(f, 0.999)").as("p999_f"),
        sum(expr("f * (f - 1) div 2")).as("pair_work"),
        sum(when(col("f") > 1, 1L).otherwise(0L)).as("multi_buckets")).collect()(0)
      val top = buckets.orderBy(col("f").desc).limit(10)
        .collect().map(_.getLong(1)).mkString("[", ",", "]")
      println(s"""{"probe":"d2_hist","scale":"$label","n_buckets":${stats.getLong(0)},""" +
        s""""max_f":${stats.getLong(1)},"p999_f":${stats.getDouble(2)},""" +
        s""""pair_work":${stats.getLong(3)},"multi_buckets":${stats.getLong(4)},""" +
        s""""top10_f":$top}""")
    }

    val fn = graft.SparkEntry.queries("d2_ngram_jaccard")
    val warm = { val t0 = System.nanoTime(); val n = fn(spark, sf1).count()
      (n, (System.nanoTime() - t0) / 1e9) }
    val ts = (1 to passes).map { _ =>
      val t0 = System.nanoTime(); fn(spark, sf1).count()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"""{"probe":"d2_passes","rows":${warm._1},"warm_sec":${warm._2}%.2f,""" +
      f""""runs":[${ts.map(t => f"$t%.2f").mkString(",")}],""" +
      f""""median":${ts.sorted.apply(ts.size / 2)}%.2f,"min":${ts.min}%.2f,""" +
      f""""max":${ts.max}%.2f,"spread":${ts.max / ts.min}%.2f}""")
    spark.stop()
  }
}
