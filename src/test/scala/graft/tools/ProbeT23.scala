package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Spark

/** t23 PMI-collocations A/B (r14, after its 10x census read 3.29x):
  * the current gate query materializes the bigram TYPE table through a
  * localCheckpoint because its four consumers (n, both margins, the
  * probe) are broadcast subtrees ReuseExchange cannot dedup. Candidate:
  * derive the margins as WINDOW sums over the type table inside ONE
  * plan — `sum(c12) over (partition by w1)`, same for w2, and the
  * global n as an unpartitioned window — no checkpoint job, no margin
  * aggregates, no broadcasts. The unpartitioned window moves the
  * TYPE table (vocab-scale, never corpus-scale) through one partition,
  * which is the documented t8/t24 bounded-window envelope.
  *
  * usage: Test/runMain graft.tools.ProbeT23 [sfDir] [passes]
  *
  * r14 OUTCOME — measured, NOT adopted: sf0.1 0.590 -> 0.449 s (-24%)
  * but sf1 0.735 -> 0.707 s (-4%, noise) with values exact at both.
  * The sf0.1 win is floor-class (one checkpoint job + three broadcasts
  * saved) and evaporates exactly where it would need to hold: the
  * unpartitioned `n` window funnels the ENTIRE type table through one
  * partition, so its cost grows linearly with vocab² while the gate
  * form's n-aggregate stays a tiny broadcast — the same
  * single-partition-window class the repo's t8/t24 discipline only
  * permits AFTER a limit. Scale-regressive; the gate query stands.
  */
object ProbeT23 {

  private def t23Windows(s: SparkSession, dir: String): DataFrame = {
    val big = graft.Tables.load(s, dir, "documents")
      .select(split(trim(col("text")), "\\s+").as("ts"))
      .filter(size(col("ts")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(ts) - 2), i -> struct(ts[i] AS w1, ts[i+1] AS w2))")).as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
    val c12 = big.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    c12
      .withColumn("cx", sum(col("c12")).over(Window.partitionBy(col("w1"))))
      .withColumn("cy", sum(col("c12")).over(Window.partitionBy(col("w2"))))
      .withColumn("n", sum(col("c12")).over(Window.partitionBy()))
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
    val spark = Spark.session(appName = "graft-probe-t23")
    val cur = graft.SparkEntry.queries("t23_pmi_collocations")
    val a = cur(spark, dir).collect().map(_.toString).toSeq
    val b = t23Windows(spark, dir).collect().map(_.toString).toSeq
    require(a == b, s"window form != gate:\n gate=${a.take(3)}\n win=${b.take(3)}")
    def time(f: (SparkSession, String) => DataFrame): Seq[Double] = {
      f(spark, dir).count()
      (1 to passes).map { _ =>
        val t0 = System.nanoTime(); f(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
    }
    val tc = time(cur); val tv = time(t23Windows)
    def med(x: Seq[Double]) = x.sorted.apply(x.size / 2)
    println(f"[probe-t23] gate=${med(tc)}%.3fs ${tc.map(t => f"$t%.2f").mkString("[",",","]")}  " +
      f"windows=${med(tv)}%.3fs ${tv.map(t => f"$t%.2f").mkString("[",",","]")}  values_equal=true")
    spark.stop()
  }
}
