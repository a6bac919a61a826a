package graft

import org.scalatest.funsuite.AnyFunSuite

/** Partition-invariance: every gate query must produce bit-identical
  * results regardless of how the data is partitioned — the property that
  * makes a local[32] verification meaningful for a 1000-executor run.
  *
  * The engine's designs claim this explicitly: integer/rational
  * arithmetic in aggregates (g1's micro-unit PageRank, t11's scaled
  * probabilities), order-insensitive sketches (t13 HLL registers, t12
  * KMV), md5-derived hashing everywhere randomness would normally sneak
  * in, and convergence-checked iteration (d8's label propagation). This
  * spec re-runs a representative slice of the inventory under different
  * `spark.sql.shuffle.partitions` (which changes aggregation grouping
  * order, join sides' partition layout, and AQE's coalescing decisions)
  * and asserts the collected results are identical.
  */
class PartitionInvarianceSpec extends AnyFunSuite {

  private lazy val spark = Spark.session(master = "local[4]", shufflePartitions = 4,
    appName = "graft-partition-invariance")
  private val dir = "/root/testdata/sf0.001"

  /** Collect `name`'s full result as a canonical sorted multiset. */
  private def rows(name: String, shufflePartitions: Int): Seq[String] = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", shufflePartitions.toString)
    try SparkEntry.queries(name)(spark, dir).collect().map(_.toString).sorted.toSeq
    finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  // The heavyweights get their own test case (failure isolation); the
  // whole remaining gate surface runs in one sweep below.
  private val representative = Seq(
    "q1_agg",              // decimal aggregate over the fact table
    "d2_ngram_jaccard",    // bucket-explode pair generation
    "d4_lsh_pairs",        // minhash -> banded LSH -> confirm
    "d8_dup_clusters",     // iterative label propagation (checkpointed)
    "g1_pagerank",         // 5-round integer PageRank (checkpointed)
    "v1_cosine_topk",      // float dot products + top-k
    "v8_pq_adc",           // PQ codebooks + scaled-integer ADC
    "t13_hll_shingles",    // 64-register HLL sketch
    "p8_weighted_sample",  // Efraimidis-Spirakis keys + top-k
    "t14_bpe_learn",       // iterative argmax + broadcast merge
    "e3_asof_join",        // as-of join (window over time)
  )

  for (name <- representative)
    test(s"$name: identical results under 3 vs 17 shuffle partitions") {
      assert(rows(name, 3) == rows(name, 17))
    }

  test("every other gate query is partition-invariant at sf0.001") {
    // approx_stats is the one intentionally engine-approximate query
    // (rows-only gate downstream for the same reason)
    val rest = SparkEntry.queries.keySet -- representative - "approx_stats"
    val broken = rest.toSeq.sorted.flatMap { name =>
      try if (rows(name, 3) == rows(name, 17)) None else Some(s"$name: results differ")
      catch { case e: Throwable => Some(s"$name: ${String.valueOf(e.getMessage).take(120)}") }
    }
    assert(broken.isEmpty, broken.mkString("\n"))
  }
}
