package graft.tools

import graft.{Spark, Tables}
import org.apache.spark.sql.functions._

/** Throwaway dev profiler for the t14/t16 round floor. */
object T14Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Spark.session(master = "local[32]", shufflePartitions = 32,
      appName = "t14-profile")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $tag: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    for (rep <- 1 to 3) {
      println(s"=== rep $rep ===")
      val w = Tables.fanout(Tables.load(spark, sfDir, "documents"))
        .filter(col("doc_id") < 100)
        .select(explode(split(trim(col("text")), "\\s+")).as("word"))
        .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      var sym = t("checkpoint") {
        w.select(
          concat(lit("  "), regexp_replace(col("word"), "(.)", "$1  ")).as("sym"),
          col("freq")).localCheckpoint(true)
      }
      println(s"[prof] sym partitions: ${sym.rdd.getNumPartitions}, rows: ${sym.count()}")
      for (k <- 1 to 5) {
        val m = t(s"round$k argmax") {
          sym
            .select(expr("filter(split(sym, '  '), x -> x != '')").as("l"), col("freq"))
            .select(explode(expr(
              "CASE WHEN size(l) < 2 THEN array() ELSE " +
              "transform(sequence(0, size(l) - 2), i -> struct(l[i] AS a, l[i+1] AS b)) END"))
              .as("p"), col("freq"))
            .groupBy(col("p.a").as("a"), col("p.b").as("b"))
            .agg(sum(col("freq")).cast("long").as("cnt"))
            .agg(min(struct((-col("cnt")).as("nc"), col("a"), col("b"))).as("m"))
            .select(col("m.a"), col("m.b"), (-col("m.nc")).as("cnt"))
            .head()
        }
        val (a, b) = (m.getString(0), m.getString(1))
        sym = sym.withColumn("sym",
          replace(col("sym"), lit(s" $a  $b "), lit(s" $a$b ")))
      }
    }
    spark.stop()
  }
}
