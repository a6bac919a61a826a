package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Spark

/** t23 round-15 A/B (VERDICT r14 ask #4; pre-registered in PERF_NOTES
  * before first run). Three arms, one window:
  *
  *  (a) gate  — the shipped query (checkpointed type table, margin
  *      aggregates broadcast-joined back);
  *  (b) floor — JUST the corpus-scale bigram explode + (w1, w2)
  *      aggregate, no margins: the irreducible work every t23 shape
  *      shares. If this alone exceeds the 2.5x target wall, no margin
  *      rework can close the gap;
  *  (c) hybrid two-phase — margins as PARTITIONED window sums (cx over
  *      w1 partitions, cy over w2: parallelism preserved, no
  *      unpartitioned funnel, no join-back) + the global n as a tiny
  *      aggregate broadcast back. The r14 rejection applied only to
  *      the unpartitioned n-window; this keeps n out of the window.
  *
  * usage: Test/runMain graft.tools.ProbeT23b [sfDir] [passes]
  */
object ProbeT23b {

  private def bigrams(s: SparkSession, dir: String): DataFrame =
    graft.Tables.load(s, dir, "documents")
      .select(split(trim(col("text")), "\\s+").as("ts"))
      .filter(size(col("ts")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(ts) - 2), i -> struct(ts[i] AS w1, ts[i+1] AS w2))")).as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))

  private def floorArm(s: SparkSession, dir: String): DataFrame =
    bigrams(s, dir).groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))

  private def hybrid(s: SparkSession, dir: String): DataFrame = {
    val c12 = floorArm(s, dir).localCheckpoint(true)
    val n = c12.agg(sum(col("c12")).cast("long").as("n"))
    c12
      .withColumn("cx", sum(col("c12")).over(Window.partitionBy(col("w1"))))
      .withColumn("cy", sum(col("c12")).over(Window.partitionBy(col("w2"))))
      .crossJoin(broadcast(n))
      .filter(col("c12") >= 5)
      .select(col("w1"), col("w2"), col("c12"),
        expr("CAST(CAST(c12 AS DECIMAL(38,0)) * n * 1000000 div " +
          "(CAST(cx AS DECIMAL(38,0)) * cy) AS BIGINT)").as("lift_ppm"))
      .orderBy(col("lift_ppm").desc, col("w1"), col("w2"))
      .limit(20)
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val passes = if (args.length > 1) args(1).toInt else 5
    val spark = Spark.session(appName = "graft-probe-t23b")
    val gate = graft.SparkEntry.queries("t23_pmi_collocations")
    val a = gate(spark, dir).collect().map(_.toString).toSeq
    val c = hybrid(spark, dir).collect().map(_.toString).toSeq
    require(a == c, s"hybrid != gate:\n gate=${a.take(3)}\n hyb=${c.take(3)}")
    def time(f: (SparkSession, String) => DataFrame): Seq[Double] = {
      f(spark, dir).count()
      (1 to passes).map { _ =>
        val t0 = System.nanoTime(); f(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
    }
    def med(x: Seq[Double]) = x.sorted.apply(x.size / 2)
    val ta = time(gate)
    val tb = time(floorArm)
    val tc = time(hybrid)
    println(f"[probe-t23b] gate=${med(ta)}%.3fs ${ta.map(t => f"$t%.2f").mkString("[",",","]")}  " +
      f"floor=${med(tb)}%.3fs ${tb.map(t => f"$t%.2f").mkString("[",",","]")}  " +
      f"hybrid=${med(tc)}%.3fs ${tc.map(t => f"$t%.2f").mkString("[",",","]")}  values_equal=true")
    spark.stop()
  }
}
