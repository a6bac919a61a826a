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
  * usage: Test/runMain graft.tools.BroadcastAudit [sfDir] [only,csv]
  * The optional csv filter restricts the sweep (used by the 100x scale
  * gate, where planning artifact-consuming queries costs real compute);
  * unknown names fail loudly (the vacuous-success trap).
  */
object BroadcastAudit {

  /** One allowlist row: WHY the generate-fed broadcast build side is
    * bounded, plus the bound AS A NUMBER the audit enforces by
    * EXECUTING the build subtree and counting its rows (VERDICT r17
    * ask #5 — a prose-only allowlist rots; an executed count cannot).
    * `maxRows` is sized from the named structural bound with headroom,
    * NOT from observed corpus sizes, so corpus growth that violates the
    * claimed invariant (not just the measurement) turns the audit red.
    * The session's 2 GiB broadcast ceiling remains the at-scale loud
    * guard for anything the per-round audit SF cannot see. */
  final case class Bound(why: String, maxRows: Long)

  /** query -> proven bound of its generate-fed broadcast build side.
    * Everything NOT here that had a generate-fed broadcast was FIXED in
    * r17 (d14/d21 duplicated-window sets, d19/d20 dfq + packed token
    * arrays, d13/d15 boilerplate set + doc-grain counts, d7 doc-grain
    * shingle counts, e16 event-proportional funnel arms — all now
    * MERGE joins after the r18 100x gate showed the r17 shuffle-hash
    * builds OOM at constant per-core memory) or in r18 (d11's
    * corpus-fraction batch shingles now share one h exchange, d18's
    * candidate pairs attach packed arrays via doc-keyed merge joins,
    * m8/v5's banded candidate pairs are merge-hinted — their r17
    * allowlist rows are gone because the broadcasts are gone). */
  val Allowlist: Map[String, Bound] = Map(
    "e10_gapfill" -> Bound("dense-grid branch: every relation downstream of the generated grid is (span-hours x event-types)-grained — bounded by wall-clock span and type cardinality, independent of event count (the query's own scale contract)", 1000000L),
    "q20_basket_lift" -> Bound("np part-frequency table joined twice: l_partkey < 3000 literal caps the key space at 3000 rows", 3000L),
    "d9_contamination" -> Bound("benchmark shingle set: doc_id < 20 (20 docs) by construction; d10 is the bloom scale path — 20 docs x <=2.5k shingles", 50000L),
    "d10_bloom_decontam" -> Bound("same doc_id < 20 benchmark set, exact confirm side of the bloom prefilter", 50000L),
    "e14_cms_topk" -> Bound("EXPLICIT: the count-min sketch — fixed d=4 x w=1024 counter grid, corpus-independent", 8192L),
    "p9_mixture" -> Bound("per-source aggregate: grouping key `source` has fixed cardinality (20)", 1000L),
    "p13_curriculum" -> Bound("EXPLICIT: per-(source, epoch) curriculum thresholds — bounded by sources x epochs", 1000L),
    "t9_vocab" -> Bound("EXPLICIT: top-K vocab under a limit (K=1000)", 10000L),
    "t12_kmv_distinct" -> Bound("per-language KMV sketches: grouping key `lang` has fixed cardinality (5), sketch is k-bounded (k=256)", 10000L),
    "t13_hll_shingles" -> Bound("per-language HLL registers: lang-grained (5) x 64 registers", 10000L),
    // r19 sf10 catch: the old entry claimed "the learned merge list
    // (5 rows)" with bound 64 — but the merges COLLECT to the driver
    // (never broadcast); what broadcasts is the word -> n_sym
    // segmentation CACHE, which is VOCAB-sized (Zipf-compact,
    // sublinear in corpus; the k=100 disjoint-copy generator
    // multiplies word types by k, 31 -> 3100). Same class as t17's
    // dfq: vocab-tail-bounded, session 2 GiB ceiling fails loudly,
    // documented remediation at the site (shuffle join; the
    // spark.graft.bpe.minFreq lever caps the learn-side input
    // independently).
    "t16_bpe_apply" -> Bound("word -> n_sym segmentation cache: vocab-sized (Zipf-compact, corpus-sublinear; generator multiplies types by k) — t17 dfq class, ceiling-guarded, shuffle-join remediation documented at the site", 5000000L),
    "t17_tfidf_pairs" -> Bound("EXPLICIT dfq broadcast: df-capped [2,100] rare-term table, documented design (TextOps) — vocab-tail-sized; at web-vocab scale the documented remediation is the shuffle join; ceiling-guarded", 5000000L),
    "c2_grid_density" -> Bound("grid-cell aggregates: cell count bounded by the fixed grid resolution, not by the corpus", 100000L),
    "v7_sq8_rerank" -> Bound("EXPLICIT: query vectors (5) + SQ8 codebook — model-sized", 10000L),
    "v10_bq_hamming" -> Bound("EXPLICIT: query vectors (5) + binary masks — model-sized", 10000L)
  )

  private def hasGenerate(p: SparkPlan): Boolean =
    p.collectFirst { case g: org.apache.spark.sql.execution.GenerateExec => g }.isDefined

  private def leaves(p: SparkPlan): Seq[String] =
    p.collectLeaves().map(_.nodeName).distinct

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val only: Option[Set[String]] =
      if (args.length > 1) Some(args(1).split(",").toSet) else None
    only.foreach { o =>
      val unknown = o -- graft.SparkEntry.queries.keySet
      require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    }
    val spark = Spark.session(appName = "graft-broadcast-audit")
    var flaggedOutside = List.empty[String]
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
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
          if (genFed.nonEmpty) Allowlist.get(name) match {
            case None => flaggedOutside ::= name
            case Some(Bound(_, maxRows)) =>
              // enforce the claimed bound by EXECUTING each flagged
              // build subtree and counting its rows — the allowlist is
              // a set of checked invariants, not prose
              genFed.foreach { b =>
                // the initialPlan subtree has no columnar->row
                // transitions yet (AQE inserts them per query stage):
                // apply the same rule prepareForExecution would, or a
                // columnar parquet scan's batches hit a row operator
                val executable = org.apache.spark.sql.execution
                  .ApplyColumnarRulesAndInsertTransitions(
                    spark.sessionState.columnarRules, outputsColumnar = false)
                  .apply(b.child)
                val rows = executable.execute().count()
                val ok = rows <= maxRows
                println(f"  bound-check $name%-22s rows=$rows%9d max=$maxRows%9d ${if (ok) "ok" else "VIOLATED"}")
                if (!ok) flaggedOutside ::= s"$name(bound: $rows > $maxRows)"
              }
          }
        }
      } catch {
        case e: Throwable =>
          // fatal: at audit scale a planning-time failure (e.g. an
          // artifact build hitting the 2 GiB broadcast ceiling) IS a
          // finding — print-and-pass would green-wash exactly the
          // hazard class this audit exists to catch
          println(s"$name AUDIT-ERROR ${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(120)}")
          flaggedOutside ::= s"$name(AUDIT-ERROR: ${e.getClass.getSimpleName})"
      }
    }
    if (flaggedOutside.nonEmpty) {
      System.err.println(s"FLAGGED (generate-fed broadcast outside allowlist, or allowlisted bound VIOLATED): ${flaggedOutside.sorted.mkString(", ")}")
      spark.stop()
      sys.exit(1)
    }
    println("BROADCAST AUDIT: clean (every generate-fed broadcast is allowlisted AND its executed row count is inside the declared bound)")
    spark.stop()
  }
}
