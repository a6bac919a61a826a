package graft.tools

import graft.Spark

/** sf1 VALUE-EQUALITY gate over the most data-bound queries (VERDICT
  * r16 ask #3): the 195-query hash gate runs at sf0.01 and sf0.1;
  * scale-dependent wrongness ABOVE that was only sampled by the
  * 17-query perf rehearsal. This tool runs the top-30 queries by total
  * shuffle bytes (full-surface JobCensus at sf0.1, r17 — the ranking
  * the ask prescribes: shuffle volume = the work that grows with data)
  * against the 10x disjoint-copy corpus, dumps each result to parquet,
  * and ships the oracle SQL for `scripts/sf1_correctness.py` to replay
  * in DuckDB over the SAME parquet and compare FULL VALUES.
  *
  * Unlike the perf rehearsal, NO cap rescaling and NO
  * `graft.graph.capScale`: both arms run the query EXACTLY as the
  * sf0.01/sf0.1 gates state it, over the same scaled tables — literal
  * id caps then select a k-fold smaller subgraph, which is irrelevant
  * for (and orthogonal to) value equality. That keeps the oracle SQL
  * byte-identical to the committed gate's, so this surface can never
  * drift from the correctness contract.
  *
  * usage: Test/runMain graft.tools.Sf1Correctness [sfDir] [outDir] [k] [only,csv]
  * Spark arm output: <outDir>/sc_results/<name>/ + sc_oracle.json +
  * sc_rows.json; the python arm writes CORRECTNESS_SF1.json.
  */
object Sf1Correctness {
  /** Tier 1: top 30 by (shuffle write + read) MB in the r17
    * full-surface JobCensus at sf0.1 — from 60 MB (d14) down to 4 MB
    * (e21); below that the surface is job-floor-bound, not data-bound.
    * z* queries are corpus-independent fixtures and excluded by
    * construction. */
  val Tier1 = Seq(
    "d14_substring_windows", "d21_exact_substr", "d20_prefix_join_skew",
    "approx_stats", "d19_prefix_join", "g2_edge_weights", "a3_percentile",
    "a13_fd_audit", "a9_profile", "d15_curation_funnel", "d13_boilerplate",
    "d7_jaccard_capped", "d11_incremental", "a7_percentiles",
    "d18_xmodal_verify", "t21_perplexity", "v5_rhp_lsh", "g9_two_hop",
    "t20_source_overlap", "q21_waiting", "distinct_agg", "d9_contamination",
    "t13_hll_shingles", "e15_sliding_distinct", "w5_range_frame", "g4_bfs",
    "q20_basket_lift", "e6_hopping_window", "v16_knn_graph", "e21_periodicity")

  /** Tier 2: census ranks 31-60 (3.8 MB down to sub-MB), minus the
    * rows the 17-query perf rehearsal already value-checks at 10x
    * (g1/g5/g8/t17 run there with their caps rescaled) — these are the
    * next most data-bound AND sweep the t-family model builders, the
    * e-family sessionization/window paths, and the p-family samplers
    * whose semantics are corpus-shape-sensitive. */
  val Tier2 = Seq(
    "e2_sessionize", "e18_event_paths", "e12_transitions", "w1_window_rank",
    "t8_bm25", "t16_bpe_apply", "v11_semdedup", "t2_quality_score",
    "q18_large_orders", "t6_corpus_filter", "t5_bpe_tokens",
    "t25_classifier_eval", "t22_heaps", "t1_token_stats", "t18_pii_redact",
    "t15_classifier", "t12_kmv_distinct", "t9_vocab", "t3_lang_id",
    "t26_langid_eval", "t24_zipf_fit", "q16_supplier_cnt", "e11_attribution",
    "q3_join_topk", "p5_source_cap", "w6_ntile_cume", "m8_dhash_neardup",
    "p13_curriculum", "e19_gini", "t10_repetition")

  val Queries: Seq[String] = Tier1 ++ Tier2

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val outDir = if (args.length > 1) args(1) else "/tmp/graft-sf1"
    val k = if (args.length > 2) args(2).toInt else 10
    val only: Set[String] =
      if (args.length > 3) args(3).split(",").toSet else Queries.toSet
    val unknown = only -- Queries.toSet
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val selected = Queries.filter(only)
    val spark = Spark.session(appName = "graft-sf1-correctness")
    Sf1Rehearsal.generate(spark, sfDir, outDir, k)

    val rows = selected.map { name =>
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(name)(spark, outDir)
      df.coalesce(1).write.mode("overwrite").parquet(s"$outDir-harness/sc_results/$name")
      val n = spark.read.parquet(s"$outDir-harness/sc_results/$name").count()
      println(f"""{"sf1_correctness":"$name","rows":$n,"sec":${(System.nanoTime() - t0) / 1e9}%.2f}""")
      name -> n
    }
    def writeJson(path: String, body: String): Unit = {
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(path).getParent)
      java.nio.file.Files.write(java.nio.file.Paths.get(path), body.getBytes("UTF-8"))
    }
    // a SUBSET run merges into the existing row map instead of
    // clobbering the other queries' counts (the Sf1Rehearsal rule —
    // regeneration wipes the dir, so merged entries are same-data)
    val rowsPath = java.nio.file.Paths.get(s"$outDir-harness/sc_rows.json")
    val prior: Map[String, Long] =
      if (java.nio.file.Files.exists(rowsPath)) {
        val txt = new String(java.nio.file.Files.readAllBytes(rowsPath), "UTF-8")
        "\"([^\"]+)\"\\s*:\\s*(\\d+)".r.findAllMatchIn(txt)
          .map(m => m.group(1) -> m.group(2).toLong).toMap
      } else Map.empty
    val merged = (prior ++ rows.toMap).toSeq.sortBy(_._1)
    writeJson(s"$outDir-harness/sc_rows.json",
      merged.map { case (n, c) => s""""$n":$c""" }.mkString("{", ",", "}"))
    // oracle SQL verbatim from the committed gate (no rewriting) — for
    // EVERY gate query, so a subset re-dump never shrinks the surface
    // the python arm replays
    val oracle = Queries.map { n =>
      val sql = graft.SparkEntry.oracleSql(n)
        .replace("\\", "\\\\").replace("\"", "\\\"").replace("\n", "\\n")
      s""""$n":"$sql""""
    }.mkString("{", ",\n", "}")
    writeJson(s"$outDir-harness/sc_oracle.json", oracle)
    println(s"[sf1-correctness] ${rows.length} queries dumped under $outDir")
    spark.stop()
  }
}
