package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev A/B: g7 k-core peel rounds WITH the per-round eager checkpoint
  * (current shape) vs as ONE adaptive plan (g5's shape). Times both
  * warmed, asserts identical output. Not part of the gate.
  */
object ProbeG7 {
  private def edges(s: SparkSession, dir: String): DataFrame = {
    val li = graft.Tables.load(s, dir, "lineitem")
      .filter(col("l_partkey") < 3000)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .repartition(col("o"))
      .distinct()
    li.as("a").join(li.as("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .select(col("a.p").as("d1"), col("b.p").as("d2"))
      .distinct()
      .localCheckpoint(true)
  }

  private def kcore(s: SparkSession, dir: String, ckpt: Boolean): DataFrame = {
    val k = 80
    var e = edges(s, dir)
    var bi = e.union(e.select(col("d2").as("d1"), col("d1").as("d2")))
    var deg = bi.groupBy(col("d1")).agg(count(lit(1)).as("deg"))
    val rounds = (1 to 4).map { r =>
      val keep = deg.filter(col("deg") >= k).select(col("d1").as("node"))
      val e2 = e.join(keep.select(col("node").as("d1")), Seq("d1"), "left_semi")
        .join(keep.select(col("node").as("d2")), Seq("d2"), "left_semi")
        .select(col("d1"), col("d2"))
      e = if (ckpt) e2.localCheckpoint(true) else e2
      bi = e.union(e.select(col("d2").as("d1"), col("d1").as("d2")))
      deg = bi.groupBy(col("d1")).agg(count(lit(1)).as("deg"))
      deg.agg(count(lit(1)).cast("long").as("n_nodes"),
          (sum(col("deg")) / 2).cast("long").as("n_edges"))
        .select(lit(r).as("round"), col("n_nodes"), col("n_edges"))
    }
    rounds.reduce(_ union _).orderBy(col("round"))
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Spark.session(appName = "probe-g7")
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // warm both
    kcore(spark, dir, ckpt = true).collect()
    kcore(spark, dir, ckpt = false).collect()
    val a = (1 to 3).map(_ => time(kcore(spark, dir, ckpt = true).collect()))
    val b = (1 to 3).map(_ => time(kcore(spark, dir, ckpt = false).collect()))
    val ra = kcore(spark, dir, ckpt = true).collect().map(_.toString).toSeq
    val rb = kcore(spark, dir, ckpt = false).collect().map(_.toString).toSeq
    println(f"ckpt:   ${a.map(x => f"$x%.2f").mkString(" ")}  min=${a.min}%.2f")
    println(f"nockpt: ${b.map(x => f"$x%.2f").mkString(" ")}  min=${b.min}%.2f")
    println(s"identical: ${ra == rb}")
    spark.stop()
  }
}
