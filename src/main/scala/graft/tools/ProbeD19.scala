package graft.tools

import org.apache.spark.sql.functions._

/** Stage-by-stage timer for the d19 prefix-join plan (dev tool). */
object ProbeD19 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Spark.session(appName = "graft-probe-d19")
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[stage] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s  rows=$n")
    }
    val docs = graft.Tables.load(spark, sfDir, "documents")
    for (_ <- 1 to 3) {
      t("docs.count")(docs.count())
      val shRaw = docs.select(col("doc_id"),
        explode(expr("word_shingle_hashes(text, 3)")).as("h"))
      t("shingles raw")(shRaw.count())
      val shH = shRaw.repartition(col("h"))
      val dfq = shH.groupBy(col("h")).agg(count_distinct(col("doc_id")).as("df"))
      t("dfq")(dfq.count())
      val packed = shH.join(dfq, Seq("h"))
        .groupBy(col("doc_id"))
        .agg(expr("transform(sort_array(collect_set(struct(df, h))), t -> t.h)").as("hs"))
        .select(col("doc_id"), col("hs"), expr("array_sort(hs)").as("hv"))
      t("packed")(packed.count())
      val t0ck = System.nanoTime()
      val pk = packed.localCheckpoint(true)
      println(f"[stage] checkpoint: ${(System.nanoTime() - t0ck) / 1e9}%.3f s")
      val pref = pk
        .select(col("doc_id"), size(col("hs")).cast("long").as("n"),
          posexplode(expr(
            "slice(hs, 1, size(hs) - CAST(ceil(size(hs) * 0.5D) AS INT) + 1)"))
            .as(Seq("pos", "h")))
        .select(col("h"),
          (col("doc_id") * lit(1L << 42) + col("pos").cast("long") * lit(1L << 21)
            + col("n")).as("pk"))
      t("pref")(pref.count())
      val raw = pref.groupBy(col("h")).agg(sort_array(collect_list(col("pk"))).as("ids"))
        .filter(size(col("ids")) > 1)
        .select(explode(graft.functions.id_pairs(col("ids"))).as("p"))
        .select(expr("shiftright(p.d1, 42)").as("d1"),
          expr("shiftright(p.d1, 21) & 2097151").as("pos1"),
          expr("p.d1 & 2097151").as("n1c"),
          expr("shiftright(p.d2, 42)").as("d2"),
          expr("shiftright(p.d2, 21) & 2097151").as("pos2"),
          expr("p.d2 & 2097151").as("n2c"))
      t("pairs w/ multiplicity")(raw.count())
      val cand = raw
        .filter((lit(1L) + least(col("n1c") - col("pos1") - lit(1L),
            col("n2c") - col("pos2") - lit(1L)))
          >= expr("(n1c + n2c + 2) div 3"))
        .select(col("d1"), col("d2"))
      t("cand (positional-filtered)")(cand.count())
      val out = cand
        .join(pk.as("p1"), col("d1") === col("p1.doc_id"))
        .join(pk.as("p2"), col("d2") === col("p2.doc_id"))
        .select(col("d1"), col("d2"),
          graft.functions.sorted_intersect_count(col("p1.hv"), col("p2.hv")).as("m"),
          size(col("p1.hv")).cast("long").as("n1"),
          size(col("p2.hv")).cast("long").as("n2"))
        .withColumn("jac_raw", col("m") / (col("n1") + col("n2") - col("m")))
        .filter(col("jac_raw") >= 0.5)
      t("verify")(out.count())
      println("[stage] ---")
    }
    spark.stop()
  }
}
