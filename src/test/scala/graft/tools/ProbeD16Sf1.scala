package graft.tools

import org.apache.spark.sql.functions._

import graft.Spark

/** d16_lsh_eval spread pin (VERDICT r12 ask #1): d16 reads 2.8-3.8x the
  * oracle at sf0.1 and its r12 sf1 window spread was 6.27-11.97 s
  * within one run vs 1.30x in the adjacent window — wide enough that
  * "noise" needs a measurement, not an analogy to d2. Two diagnostics,
  * ProbeD2Sf1's exact idiom:
  *
  *  1. The BAND-BUCKET histogram at sf0.1 vs sf1 — d16's candidate
  *     surface is the 4-band MinHash bucketing, so its pair work is
  *     sum over band-key buckets of f*(f-1)/2. The disjoint-copy sf1
  *     construction suffixes tokens per copy, which perturbs every
  *     shingle hash and therefore every MinHash signature: if band
  *     buckets stay shallow at 10x (max_f / p999 / pair_work scaling
  *     ~linearly), no hot-band regime shift exists and candidate
  *     generation cannot be the swing. The truth side's shingle-bucket
  *     histogram is ProbeD2Sf1's (shared surface, not re-measured).
  *
  *  2. A 7-pass within-JVM series of the GATED d16 plan at sf1, warm
  *     pass excluded, so the spread claim rests on 7 points in one
  *     window instead of r12's 3.
  *
  * usage: Test/runMain graft.tools.ProbeD16Sf1 [sf01Dir] [sf1Dir] [passes]
  */
object ProbeD16Sf1 {
  def main(args: Array[String]): Unit = {
    val sf01 = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val sf1 = if (args.length > 1) args(1) else "/tmp/graft-sf1"
    val passes = if (args.length > 2) args(2).toInt else 7
    val spark = Spark.session(appName = "graft-probe-d16")

    for ((label, dir) <- Seq("sf0.1" -> sf01, "sf1" -> sf1)) {
      // d16's band relation verbatim: distinct word-3-gram hashes ->
      // 8 MinHash values in one aggregate -> 4 band keys per doc
      val sh = graft.Tables.load(spark, dir, "documents")
        .select(col("doc_id"), explode(expr("word_shingle_hashes(text, 3)")).as("h"))
        .distinct()
      val p = 2147483647L // DedupOps.P
      val aggs = (0 to 7).map(i =>
        min((lit(2 * i + 1) * expr("CAST(shiftright(h, 28) AS BIGINT)") +
          lit(7919L * i)) % p).as(s"mh$i"))
      val sig = sh.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
      val bands = sig.select(col("doc_id"), explode(expr(
        "array(" + (0 to 3).map(b =>
          s"concat('$b,', mh${2 * b}, ',', mh${2 * b + 1})").mkString(",") + ")"))
        .as("s"))
      val buckets = bands.groupBy(col("s")).agg(count(lit(1)).as("f"))
      val stats = buckets.agg(
        count(lit(1)).as("n_buckets"),
        max(col("f")).as("max_f"),
        expr("percentile(f, 0.999)").as("p999_f"),
        sum(expr("f * (f - 1) div 2")).as("pair_work"),
        sum(when(col("f") > 1, 1L).otherwise(0L)).as("multi_buckets")).collect()(0)
      val top = buckets.orderBy(col("f").desc).limit(10)
        .collect().map(_.getLong(1)).mkString("[", ",", "]")
      println(s"""{"probe":"d16_band_hist","scale":"$label","n_buckets":${stats.getLong(0)},""" +
        s""""max_f":${stats.getLong(1)},"p999_f":${stats.getDouble(2)},""" +
        s""""pair_work":${stats.getLong(3)},"multi_buckets":${stats.getLong(4)},""" +
        s""""top10_f":$top}""")
    }

    val fn = graft.SparkEntry.queries("d16_lsh_eval")
    val warm = { val t0 = System.nanoTime(); val n = fn(spark, sf1).count()
      (n, (System.nanoTime() - t0) / 1e9) }
    val ts = (1 to passes).map { _ =>
      val t0 = System.nanoTime(); fn(spark, sf1).count()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"""{"probe":"d16_passes","rows":${warm._1},"warm_sec":${warm._2}%.2f,""" +
      f""""runs":[${ts.map(t => f"$t%.2f").mkString(",")}],""" +
      f""""median":${ts.sorted.apply(ts.size / 2)}%.2f,"min":${ts.min}%.2f,""" +
      f""""max":${ts.max}%.2f,"spread":${ts.max / ts.min}%.2f}""")
    spark.stop()
  }
}
