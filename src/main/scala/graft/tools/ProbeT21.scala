package graft.tools

import org.apache.spark.sql.functions._

/** Stage-by-stage timer for the t21 bigram-LM plan (dev tool). */
object ProbeT21 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Spark.session(appName = "graft-probe-t21")
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[stage] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s  rows=$n")
    }
    val docs = graft.Tables.load(spark, sfDir, "documents")
    for (_ <- 1 to 3) {
      val toks = docs.select(col("doc_id"), split(trim(col("text")), "\\s+").as("ts"))
      t("toks scan")(toks.count())
      val raw = toks
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(ts) - 1), i -> struct(ts[i] AS w1, " +
            "IF(i < size(ts) - 1, ts[i + 1], NULL) AS w2))")).as("b"))
        .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
        .filter(col("w1").isNotNull)
      t("explode raw")(raw.count())
      val g = raw.groupBy(col("doc_id"), col("w1"), col("w2")).agg(count(lit(1)).as("k"))
      t("g agg")(g.count())
      val dw = g.filter(col("w2").isNotNull)
      val c12 = dw.groupBy(col("w1"), col("w2")).agg(sum(col("k")).cast("long").as("c12"))
      t("c12")(c12.count())
      val c1 = c12.groupBy(col("w1")).agg(sum(col("c12")).cast("long").as("c1"))
      t("c1")(c1.count())
      val vocab = g.filter(col("k") >= 1).agg(countDistinct(col("w1")).as("v"))
      t("vocab from g")(vocab.count())
      val vocab2 = toks.select(explode(col("ts")).as("tok")).agg(countDistinct(col("tok")).as("v"))
      t("vocab fresh scan")(vocab2.count())
      println("[stage] ---")
    }
    spark.stop()
  }
}
