package graft.tools

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec

import graft.Spark

/** Static sweep for the d14 hazard class (r17): a BroadcastExchange
  * whose BUILD subtree contains a Generate (explode) — the planner's
  * Generate stats don't model fan-out, so an exploded corpus relation
  * (shingles, windows, n-grams) can be estimated under the broadcast
  * threshold while actually being corpus-proportional. The sf1 gate
  * catches the ones big enough to hit the 2 GiB ceiling at 10x; this
  * audit flags the PATTERN at any size, over every gate query, so the
  * remaining broadcasts can be verified model-/dim-bounded by reading.
  *
  * Output: one line per query that broadcasts at all —
  *   <query>  n_broadcasts=K  generate_fed=J  leaves=[...]
  * and a FLAGGED section for generate-fed broadcasts. Exit 1 if any
  * query OUTSIDE the allowlist has a generate-fed broadcast.
  *
  * Allowlist: queries whose generate-fed broadcast side is PROVEN
  * bounded (by a cap/filter/limit the plan can't express in stats) —
  * each entry cites the bound.
  *
  * usage: Test/runMain graft.tools.BroadcastAudit [sfDir]
  */
object BroadcastAudit {

  /** query -> why its generate-fed broadcast build side is bounded
    * (each entry names the bound; the session's 2 GiB broadcast ceiling
    * makes any violated bound a LOUD failure, never a silent hang).
    * Everything NOT here that had a generate-fed broadcast was FIXED in
    * r17 (shuffle_hash hints): d14/d21 (duplicated-window sets),
    * d19/d20 (dfq + packed token arrays), d13/d15 (boilerplate set +
    * doc-grain counts), d7/d18/d11 (doc-grain shingle counts), e16
    * (event-proportional funnel arms). */
  val Allowlist: Map[String, String] = Map(
    "d9_contamination" -> "benchmark shingle set: doc_id < 20 (20 docs) by construction; d10 is the bloom scale path",
    "d10_bloom_decontam" -> "same doc_id < 20 benchmark set, exact confirm side of the bloom prefilter",
    "d11_incremental" -> "EXPLICIT bsh broadcasts: the incoming-batch shingle set — batch-sized by the incremental-dedup contract (the increment is small relative to the standing corpus); a too-large increment fails loudly at the 2 GiB ceiling and the remediation is the shuffle join",
    "d18_xmodal_verify" -> "EXPLICIT cand broadcast: the Materialized near-dup candidate pair artifact — candidate/result-sized (the engine's broadcast-candidates discipline)",
    "e14_cms_topk" -> "EXPLICIT: the count-min sketch — fixed 2^k counter array, corpus-independent",
    "m8_dhash_neardup" -> "EXPLICIT: banded-Hamming candidate pairs — candidate/result-sized",
    "p9_mixture" -> "per-source aggregate: grouping key `source` has fixed cardinality (20)",
    "p13_curriculum" -> "EXPLICIT: per-(source, epoch) curriculum thresholds — bounded by sources x epochs",
    "t9_vocab" -> "EXPLICIT: top-K vocab under a limit",
    "t12_kmv_distinct" -> "per-language KMV sketches: grouping key `lang` has fixed cardinality (5), sketch is k-bounded",
    "t13_hll_shingles" -> "per-language HLL registers: lang-grained (5) x 64 registers",
    "t16_bpe_apply" -> "EXPLICIT: the learned merge list (5 rows by construction)",
    "t17_tfidf_pairs" -> "EXPLICIT dfq broadcast: df-capped [2,100] rare-term table, documented design (TextOps) — at web-vocab scale this is the heavy tail and the documented remediation is the shuffle join; ceiling-guarded",
    "c2_grid_density" -> "grid-cell aggregates: cell count bounded by the fixed grid resolution, not by the corpus",
    "v5_rhp_lsh" -> "banded-LSH candidate pairs: candidate/result-sized (the broadcast-candidates discipline, explicit in v11/d16)",
    "v7_sq8_rerank" -> "EXPLICIT: query vectors (5) + SQ8 codebook — model-sized",
    "v10_bq_hamming" -> "EXPLICIT: query vectors (5) + binary masks — model-sized"
  )

  private def hasGenerate(p: SparkPlan): Boolean =
    p.collectFirst { case g: org.apache.spark.sql.execution.GenerateExec => g }.isDefined

  private def leaves(p: SparkPlan): Seq[String] =
    p.collectLeaves().map(_.nodeName).distinct

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Spark.session(appName = "graft-broadcast-audit")
    var flaggedOutside = List.empty[String]
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan
        // initial (pre-AQE) physical plan: the static planner's broadcast
        // choices — exactly where the estimate hazard lives
        val inner = plan match {
          case a: AdaptiveSparkPlanExec => a.initialPlan
          case p => p
        }
        val bcasts = inner.collect { case b: BroadcastExchangeExec => b }
        if (bcasts.nonEmpty) {
          val genFed = bcasts.filter(b => hasGenerate(b.child))
          val tag = if (genFed.nonEmpty) "GENERATE-FED" else "ok"
          println(f"$name%-26s n_broadcasts=${bcasts.size} generate_fed=${genFed.size} $tag " +
            genFed.map(b => leaves(b.child).mkString("+")).mkString("[", " | ", "]"))
          if (genFed.nonEmpty && !Allowlist.contains(name))
            flaggedOutside ::= name
        }
      } catch {
        case e: Throwable =>
          println(s"$name AUDIT-ERROR ${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(120)}")
      }
    }
    if (flaggedOutside.nonEmpty) {
      System.err.println(s"FLAGGED (generate-fed broadcast outside allowlist): ${flaggedOutside.sorted.mkString(", ")}")
      spark.stop()
      sys.exit(1)
    }
    println("BROADCAST AUDIT: clean (every generate-fed broadcast is allowlisted with its bound)")
    spark.stop()
  }
}
