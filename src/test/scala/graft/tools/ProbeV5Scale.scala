package graft.tools

import org.apache.spark.sql.functions._

import graft.Spark

/** Measured-evidence probe for v5_rhp_lsh's sf10 feasibility (VERDICT
  * r18 ask #5 carve-out discipline: "carve-outs only with measured
  * evidence"). v5's signature space is a CONSTANT 64 buckets (4 bands
  * x 4-bit keys) — see the bounded-side audit note at the v5 join site
  * (SimilarityOps.scala) — so its candidate-pair count scales with the
  * SQUARE of bucket occupancy. This probe computes the ACTUAL bucket
  * histogram at a given corpus (signatures are row-local; the
  * histogram is 64 groups — seconds, not hours) and derives the exact
  * pre-distinct candidate-pair count sum(c*(c-1)/2) and its projected
  * explode/shuffle volume, WITHOUT running the quadratic explosion.
  *
  * It also reports the per-bucket pair-array bytes the query's eager
  * flatten(transform(...)) kernel would materialize for the LARGEST
  * bucket in one row — the first hard wall (UnsafeArrayData is capped
  * at 2 GiB) before the shuffle-volume wall.
  *
  * usage: Test/runMain graft.tools.ProbeV5Scale <corpusDir>
  */
object ProbeV5Scale {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Spark.session(appName = "probe-v5-scale")
    val e = graft.Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val planes = graft.queries.SimilarityOps.planes
    val sig = e.select(col("vec_id"),
      (0 until 16).map { b =>
        when(round(graft.functions.vector_dot(col("embedding"),
          typedLit(planes(b).toSeq)), 6) >= 0, lit(1L << b)).otherwise(lit(0L))
      }.reduce(_ + _).as("sig"))
    val hist = sig
      .select(explode(expr("sequence(0, 3)")).as("band"), col("sig"))
      .select(col("band"), expr("shiftright(sig, band * 4) & 15").as("bkey"))
      .groupBy(col("band"), col("bkey")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc)
      .collect() // 64 rows max by construction
    val n = e.count()
    val pairs = hist.map { r => val c = r.getLong(2); c * (c - 1) / 2 }.sum
    val maxBucket = if (hist.nonEmpty) hist.head.getLong(2) else 0L
    val maxPairArr = maxBucket * (maxBucket - 1) / 2
    // explode feeds struct(id1: long, id2: long) = 16 B payload + array
    // header overhead; shuffle rows carry the two longs
    println(s"""{"probe":"v5_scale","dir":"$dir","n_vectors":$n,""" +
      s""""n_buckets":${hist.length},"max_bucket":$maxBucket,""" +
      s""""pre_distinct_pairs":$pairs,""" +
      s""""max_bucket_pair_array_bytes":${maxPairArr * 16},""" +
      s""""projected_candidate_shuffle_bytes":${pairs * 16}}""")
    spark.stop()
  }
}
