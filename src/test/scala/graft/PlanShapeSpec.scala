package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape assertions: the optimizations the engine relies on at scale
  * must actually appear in the physical plans — filter/column pushdown to
  * the parquet scan, broadcast joins for dimension tables, no cartesian
  * products where a hash join belongs. */
class PlanShapeSpec extends AnyFunSuite {

  private lazy val spark = Spark.session(master = "local[4]", shufflePartitions = 4,
    appName = "graft-plan-test")
  // Overridable so the 100x scale gate can re-pin every shape invariant
  // against the scaled corpus, where the planner's stats-driven choices
  // (broadcast vs shuffle) can genuinely flip — the d14 hazard class.
  private val dir =
    sys.env.getOrElse("GRAFT_PLANSHAPE_DIR", "/root/testdata/sf0.001")

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("q1: shipdate filter and column pruning reach the parquet scan") {
    val p = plan("q1_agg")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), p)
    // only the referenced columns are read (no l_orderkey/l_partkey/...)
    assert(p.contains("ReadSchema"), p)
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!readSchema.contains("l_partkey"), readSchema)
    assert(readSchema.contains("l_shipdate"), readSchema)
  }

  test("q5: dimension tables join via broadcast, fact side never broadcast") {
    val p = plan("q5_multi_join")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.toLowerCase.contains("cartesianproduct"), p)
  }

  test("t4: doc_id pushdown on documents") {
    val p = plan("t4_fingerprint")
    assert(p.contains("PushedFilters: [IsNotNull(doc_id), LessThan(doc_id,200)]"), p)
  }

  test("v1: scoring runs inside whole-stage codegen with broadcast queries") {
    val p = plan("v1_cosine_topk")
    assert(p.contains("vector_dot"), p)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
  }

  test("v5: LSH candidates come from an equi-join shuffle, never a cross join") {
    val p = plan("v5_rhp_lsh")
    assert(!p.toLowerCase.contains("cartesianproduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("d6: banded SimHash candidates come from bucket equi-joins, no nested loop") {
    val p = plan("d6_simhash_pairs")
    assert(!p.toLowerCase.contains("cartesianproduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("v4: exact pair scoring is a blocked equi-join, no nested loop") {
    val p = plan("v4_embedding_neardup")
    assert(!p.toLowerCase.contains("cartesianproduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("d18: candidates come from the shared pair artifact; packed-array merge attaches, no broadcast") {
    val p = plan("d18_xmodal_verify")
    // the rewire is structural: the candidate side is a parquet scan of
    // the materialized near-dup relation (graft-mv-neardup-*), not a
    // recomputation of v4's blocked quadratic pass
    assert(p.contains("graft-mv-neardup-"), p)
    // r18: candidate pairs are corpus-proportional — never broadcast,
    // never hash-built; the shingle arrays attach via doc-keyed SMJ and
    // the overlap is the row-local two-pointer kernel
    assert(!p.contains("BroadcastExchange"), p)
    assert(p.contains("SortMergeJoin"), p)
    assert(p.contains("sorted_intersect_count"), p)
    assert(!p.toLowerCase.contains("cartesianproduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("t21: the LM model side reads the bigram artifacts and broadcasts; dw is the only corpus consumer") {
    val p = plan("t21_perplexity")
    assert(p.contains("graft-mv-bigrams-"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.toLowerCase.contains("cartesianproduct"), p)
    // exactly ONE scan of the documents table survives (the dw scoring
    // relation); model + vocab come from the artifacts
    val docScans = p.linesIterator.count(l =>
      l.contains("FileScan parquet") && l.contains("documents"))
    assert(docScans == 1, s"expected 1 documents scan, saw $docScans:\n$p")
  }

  test("d9: benchmark shingles broadcast into a semi-join, corpus scanned once") {
    val p = plan("d9_contamination")
    assert(p.contains("LeftSemi"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.toLowerCase.contains("cartesianproduct"), p)
  }

  test("t8/t9: global top-k is TakeOrderedAndProject, not a one-partition window") {
    for (q <- Seq("t8_bm25", "t9_vocab")) {
      val p = plan(q)
      assert(p.contains("TakeOrderedAndProject"), s"$q: $p")
    }
  }

  test("q8: outer join distribution has no cartesian") {
    val p = plan("q8_custdist")
    assert(p.contains("LeftOuter"), p)
    assert(!p.toLowerCase.contains("cartesianproduct"), p)
  }

  test("q4: grouping sets expand once into one aggregate") {
    val p = plan("q4_grouping_sets")
    assert(p.linesIterator.count(_.trim.startsWith("Expand")) <= 2, p)
    assert(!p.toLowerCase.contains("cartesianproduct"), p)
  }

  test("t6: corpus pipeline keeps the quality gate ahead of the dedup exchange") {
    val p = plan("t6_corpus_filter")
    // the dedup shuffle is hash-partitioned by fingerprint, and the only
    // wide operators are that exchange + the final rollup
    assert(p.contains("hashpartitioning(fp"), p)
    assert(!p.toLowerCase.contains("cartesianproduct"), p)
  }

  test("d10: bloom prefilter guards the exact confirmation semi-join") {
    val p = plan("d10_bloom_decontam")
    // the bloom probe must appear as a filter on the corpus side, and the
    // exactness comes from a semi-join behind it — never a cartesian
    assert(p.contains("might_contain"), p)
    assert(p.contains("LeftSemi"), p)
    assert(!p.toLowerCase.contains("cartesianproduct"), p)
  }

  test("v10: Hamming candidate scan is xor+popcount, rerank never cross-joins") {
    val p = plan("v10_bq_hamming")
    assert(p.contains("bit_count"), p)
    assert(!p.toLowerCase.contains("cartesianproduct"), p)
  }

  test("t11/e10: model joins and grid build stay hash/broadcast, no cartesian") {
    for (q <- Seq("t11_bigram_lm", "e10_gapfill")) {
      val p = plan(q)
      assert(!p.toLowerCase.contains("cartesianproduct"), s"$q: $p")
    }
  }

  test("d11: batch x corpus shingle join is an in-place merge on one h exchange, no broadcast") {
    val p = plan("d11_incremental")
    // r18: the batch is a corpus FRACTION (doc_id % 7) — broadcasting
    // it was the d14 hazard one step removed; both splits now read the
    // single h-grained exchange and merge-join in place
    assert(!p.contains("BroadcastExchange"), p)
    assert(p.contains("SortMergeJoin"), p)
    assert(p.contains("LeftSemi"), p)
    assert(!p.toLowerCase.contains("cartesianproduct"), p)
  }

  test("v11: semdedup pair scan is a shuffle-hash equi-join on the cluster id") {
    val p = plan("v11_semdedup")
    assert(p.contains("ShuffledHashJoin"), p)
    assert(!p.toLowerCase.contains("cartesianproduct"), p)
  }

  test("p7: the corpus prefix-sum window is partitioned by bucket") {
    val p = plan("p7_pack")
    // the only window over corpus-sized data must be keyed by the range
    // bucket; the bucket-totals window runs on the 500x-smaller table
    assert(p.contains("hashpartitioning(bucket"), p)
    assert(!p.toLowerCase.contains("cartesianproduct"), p)
  }

  test("p8: weighted-sample top-k is TakeOrderedAndProject, not a global sort") {
    val p = plan("p8_weighted_sample")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("g1/d13/t13/e12: round-5 aggregation pipelines never cross-join") {
    for (q <- Seq("g1_pagerank", "d13_boilerplate", "t13_hll_shingles",
        "e12_transitions")) {
      val p = plan(q)
      assert(!p.toLowerCase.contains("cartesianproduct"), s"$q: $p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q: $p")
    }
  }

  test("v12: the metadata predicate reaches the parquet scan before scoring") {
    val p = plan("v12_filtered_topk")
    assert(p.contains("EqualTo(label,3)"), p)
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("d14/g2: window and pair aggregates stay equi-join/broadcast, no cartesian") {
    for (q <- Seq("d14_substring_windows", "g2_edge_weights")) {
      val p = plan(q)
      assert(!p.toLowerCase.contains("cartesianproduct"), s"$q: $p")
    }
    assert(plan("g2_edge_weights").contains("TakeOrderedAndProject"))
  }

  test("d14/d21: the duplicated-window join-backs NEVER broadcast (corpus-proportional build sides)") {
    // r17 sf1-gate catch: the planner's fan-out-blind Generate estimate
    // sent the dup/occ sets (corpus-proportional by definition) under
    // the broadcast threshold; at 10x the build hit the 2 GiB ceiling.
    // r17 pinned shuffle-hash joins; the r18 100x gate then OOM'd those
    // very builds (SHJ's HashedRelation cannot spill), so the pin is
    // now SORT-MERGE: the only join whose memory is bounded at any
    // corpus-to-memory ratio.
    for (q <- Seq("d14_substring_windows", "d21_exact_substr")) {
      val p = plan(q)
      assert(!p.contains("BroadcastExchange"),
        s"$q must not broadcast any relation (all join sides are corpus- or doc-proportional): $p")
      assert(!p.contains("ShuffledHashJoin"),
        s"$q: SHJ builds a non-spillable HashedRelation from a corpus-proportional side: $p")
      assert(p.contains("SortMergeJoin"), s"$q: expected merge join-backs: $p")
    }
  }

  test("c1: kmeans assignment is a single-row broadcast, update shuffles model-sized keys") {
    val p = plan("c1_kmeans")
    // the centroid matrix rides in one broadcast row: the only join shapes
    // allowed are broadcast (model) and the tiny cid-keyed left join
    assert(!p.toLowerCase.contains("cartesianproduct"), p)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    // per-(cid,dim) partial aggregation happens map-side before the exchange
    assert(p.contains("partial_"), p)
  }

  test("g3: triangle closing is an equi-join over oriented edges, top-k never sorts globally") {
    val p = plan("g3_triangles")
    assert(!p.toLowerCase.contains("cartesianproduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("t15/p9: classifier scoring and mixture explode stay shuffle-free before the rollup") {
    for (q <- Seq("t15_classifier", "p9_mixture")) {
      val p = plan(q)
      assert(!p.toLowerCase.contains("cartesianproduct"), s"$q: $p")
      // exactly the aggregation exchanges, never a join/repartition of the corpus:
      // scoring (t15) has one agg exchange; the mixture (p9) has its two rollups
      val exchanges = p.linesIterator.count(_.trim.startsWith("Exchange"))
      assert(exchanges <= (if (q == "p9_mixture") 3 else 1), s"$q exchanges=$exchanges:\n$p")
    }
  }

  test("t17/p10/v8: pair merges and encodes stay equi-join + hash-agg shaped") {
    // t17: candidate pairs come from term buckets, never a doc x doc join
    val t17 = plan("t17_tfidf_pairs")
    assert(!t17.toLowerCase.contains("cartesianproduct"), t17)
    // p10: only source-count rows ever cross-join (single-row broadcasts)
    val p10 = plan("p10_temperature_mix")
    assert(!p10.toLowerCase.contains("cartesianproduct"), p10)
    // v8 (round 13): encode and ADC are the FUSED map-only kernels in
    // the scan projection — pq_encode/pq_adc9 present, and the old
    // explode + broadcast-join + max_by encode must NOT resurface (it
    // shuffled the corpus n x nSub ways)
    val v8 = plan("v8_pq_adc")
    assert(v8.contains("pq_encode") && v8.contains("pq_adc9"), v8)
    assert(!v8.contains("max_by"), v8)
    // exactly one Window operator (the top-3 ranking; WindowGroupLimit
    // rows are its pushed-down limit, not extra windows)
    assert(v8.linesIterator.count(_.contains("Window [")) == 1, v8)
  }

  test("generator expressions are never duplicated into inferred filters") {
    // InferFiltersFromGenerate copies the explode's child expression into a
    // Filter (IsNotNull && size > 0); with computed higher-order generators
    // (shingle/bigram transform builders) that filter re-evaluates the
    // lambda interpreted, per element — measured 21x slower on t10 at
    // sf0.1. The session excludes the rule (Spark.scala); these plans are
    // the regression tripwire: no Filter condition may contain a
    // higher-order generator rebuild.
    for (q <- Seq("t10_repetition", "d2_ngram_jaccard", "d7_jaccard_capped")) {
      val p = plan(q)
      val badFilter = p.linesIterator.exists(l =>
        l.contains("Filter ") && l.contains("transform("))
      assert(!badFilter, s"$q has a Filter re-evaluating a generator HOF:\n$p")
    }
  }

  test("q10/q18: date/flag filters push to the scans, top-k never sorts globally") {
    val q10 = plan("q10_returned")
    assert(q10.contains("GreaterThanOrEqual(o_orderdate"), q10)
    assert(q10.contains("EqualTo(l_returnflag,R)"), q10)
    assert(q10.contains("TakeOrderedAndProject"), q10)
    val q18 = plan("q18_large_orders")
    assert(q18.contains("TakeOrderedAndProject"), q18)
    assert(!q18.toLowerCase.contains("cartesianproduct"), q18)
  }

  test("q15/q22: scalar thresholds ride in broadcasts, dormancy is a left anti join") {
    val q15 = plan("q15_top_supplier")
    assert(q15.contains("BroadcastHashJoin"), q15)
    assert(!q15.toLowerCase.contains("cartesianproduct"), q15)
    val q22 = plan("q22_dormant")
    assert(q22.contains("LeftAnti"), q22)
    // the dormancy cutoff prunes the orders scan before the anti join
    assert(q22.contains("GreaterThanOrEqual(o_orderdate"), q22)
    assert(!q22.toLowerCase.contains("cartesianproduct"), q22)
  }

  test("q17: correlated small-quantity avg decorrelates to aggregate-then-join") {
    val p = plan("q17_small_qty")
    assert(!p.toLowerCase.contains("cartesianproduct"), p)
    assert(p.contains("partial_"), p) // per-part averages combine map-side
  }

  test("e16/c2/v15: round-6 joins stay equi-keyed, never nested-loop on data") {
    // g5 is deliberately absent: its per-round joins end in
    // localCheckpoint, so the final executedPlan is a LogicalRDD scan
    // and any join assertion on it would be vacuously green
    for (q <- Seq("e16_timed_funnel", "c2_grid_density")) {
      val p = plan(q)
      assert(!p.toLowerCase.contains("cartesianproduct"), s"$q: $p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q: $p")
    }
    // v15 composes v1 (whose brute-force ground truth legitimately
    // broadcasts the 5-query side as a nested loop) — only cartesians
    // are banned there
    assert(!plan("v15_recall_eval").toLowerCase.contains("cartesianproduct"))
  }

  test("t18: redaction is one scan and one rollup — no join, no extra exchange") {
    val p = plan("t18_pii_redact")
    // regexp_count lowers to size(regexp_extract_all(...)) — row-local
    assert(p.contains("regexp_extract_all"), p)
    assert(!p.contains("Join"), p)
    // exactly the rollup's hash exchange + the final order-by's range
    // exchange; nothing corpus-shaped moves besides the 5-group aggregate
    val exchanges = p.linesIterator.count(_.trim.startsWith("Exchange"))
    assert(exchanges <= 2, s"exchanges=$exchanges:\n$p")
  }

  test("v16: the kNN-graph pair scan is a cell-keyed join, corpus never broadcasts") {
    val p = plan("v16_knn_graph")
    assert(!p.toLowerCase.contains("cartesianproduct"), p)
    // the pair scan itself must be shuffle-keyed on the cell id (hash or
    // sort-merge), and the cell join must NEVER be a broadcast — at
    // scale both sides are corpus-sized, so a BroadcastHashJoin on the
    // cell key is exactly the regression this guards against
    assert(p.contains("ShuffledHashJoin") || p.contains("SortMergeJoin"), p)
    assert(!p.contains("BroadcastHashJoin [cell"), p)
  }

  test("q19: the disjunction's common bounds push to both scans") {
    val p = plan("q19_disjunctive")
    assert(p.contains("LessThanOrEqual(l_quantity,30"), p)
    assert(p.contains("LessThanOrEqual(p_size,30)"), p)
    assert(!p.toLowerCase.contains("cartesianproduct"), p)
  }

  test("p12: the only corpus window is partitioned by length bucket") {
    val p = plan("p12_length_batches")
    assert(p.contains("hashpartitioning(bucket"), p)
    assert(!p.toLowerCase.contains("cartesianproduct"), p)
    assert(!p.contains("Join"), p)
  }

  test("g7: round summaries read materialized peel leaves, no cartesian") {
    val p = plan("g7_kcore")
    // the peel's semi-joins ran eagerly at localCheckpoint time, so the
    // final plan must be summary aggregates over materialized leaves
    // (Scan ExistingRDD) — NOT a re-derived 4-round join tree
    assert(p.contains("Scan ExistingRDD"), p)
    assert(!p.toLowerCase.contains("cartesianproduct"), p)
    assert(!p.contains("LeftSemi"), p)
  }

  test("a9: each profile branch scans exactly its own column, no Expand") {
    val p = plan("a9_profile")
    // the one-aggregate alternative plans a 7-way Expand of full-width
    // rows (measured 8.6 s vs 0.9 s at sf0.1) — this shape must stay
    // six pruned single-column scans
    assert(!p.contains("Expand"), p)
    val schemas = p.linesIterator.filter(_.contains("ReadSchema")).toSeq
    assert(schemas.size == 6, s"expected 6 pruned scans\n$p")
    // every scan reads exactly one column (no struct<a:…,b:…>)
    schemas.foreach { rs =>
      val struct = rs.substring(rs.indexOf("ReadSchema: struct<"))
      assert(!struct.contains(","), rs)
    }
  }

  test("d15: the funnel's only joins are the boilerplate side, no nested loop") {
    val p = plan("d15_curation_funnel")
    assert(!p.toLowerCase.contains("cartesianproduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q21: the decorrelated quantifier pair never cartesians or nested-loops") {
    val p = plan("q21_waiting")
    assert(!p.toLowerCase.contains("cartesianproduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // the F-order status predicate reaches the orders scan
    assert(p.contains("EqualTo(o_orderstatus,F)"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("s2: zorder_key evaluates inside whole-stage codegen, one hash aggregate") {
    val p = plan("s2_zorder_layout")
    assert(p.contains("zorder_key"), p)
    val line = p.linesIterator.find(_.contains("zorder_key")).get
    assert(line.trim.startsWith("*") || line.contains("HashAggregate") ||
      line.contains("Project"), line)
    // the audit aggregates map-side before its one exchange
    assert(p.contains("partial_count"), p)
  }

  test("q23/e23: interval builds window by their natural keys, no corpus-wide window") {
    val q23 = plan("q23_scd2")
    // every window is PARTITION BY o_custkey — no unpartitioned corpus window
    assert(!q23.contains("Window [") ||
      q23.linesIterator.filter(_.contains("windowspecdefinition(")).forall(
        _.contains("o_custkey")), q23)
    assert(q23.contains("LessThan(o_custkey,300)"), q23)
    // e23's only unpartitioned window runs on the quarter relation,
    // AFTER the customer-sized aggregate (bounded by calendar quarters)
    val e23 = plan("e23_hazard")
    val aggIdx = e23.indexOf("HashAggregate")
    val winIdx = e23.indexOf("Window")
    assert(aggIdx >= 0 && winIdx >= 0 && winIdx < e23.lastIndexOf("HashAggregate"), e23)
  }

  test("nearest_centroid assignment stays inside whole-stage codegen") {
    // r15: c1 consumes the materialized Lloyd model, so the assignment
    // no longer appears in c1's CONSUMER plan — pin the codegen property
    // on the expression directly (the shape the lloyd build runs)
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.{col, expr}
    val q = Seq((1L, Seq(1L, 2L))).toDF("vec_id", "qv")
    val cs = Seq((Seq((0L, Seq(0L, 0L)), (1L, Seq(3L, 3L))))).toDF("cs")
    val p = q.crossJoin(org.apache.spark.sql.functions.broadcast(cs))
      .select(col("vec_id"),
        graft.functions.nearest_centroid(col("qv"), col("cs")).as("m"))
      .queryExecution.executedPlan.toString
    assert(p.contains("nearest_centroid"), p)
    val line = p.linesIterator.find(_.contains("nearest_centroid")).get
    assert(line.trim.startsWith("*") || line.contains("Project"), line)
  }

  test("c1 consumes the materialized Lloyd model: artifact scan + model-sized aggregate") {
    val p = plan("c1_kmeans")
    // the corpus-scale fit runs once in the Materialized build; the
    // gated consumer must be a parquet scan of the artifact feeding a
    // broadcast-joined model-sized aggregate — never a corpus re-fit
    assert(p.contains("mv-lloyd"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.toLowerCase.contains("cartesianproduct"), p)
  }

  // --- round-7 floor-burndown shapes: these exchanges were REMOVED; the
  // assertions keep them removed ---

  test("t17: per-doc tf is row-local and the rare-term table broadcasts") {
    val p = plan("t17_tfidf_pairs")
    // run-length over the sorted token array, not a (doc, word) groupBy
    assert(p.contains("zip_with"), p)
    // the r6 corpus-scale shuffle of raw (doc_id, w) occurrences is gone
    assert(!p.contains("hashpartitioning(doc_id#") ||
      !p.linesIterator.exists(l => l.contains("hashpartitioning(doc_id#") &&
        l.contains(", w#")), p)
    // df-capped vocabulary joins by broadcast, never by reshuffling tf
    assert(p.contains("BroadcastHashJoin [w#"), p)
  }

  test("t14/t16: BPE merge rounds run in one task, application joins broadcast") {
    val p14 = plan("t14_bpe_learn")
    assert(p14.contains("MapPartitions") && p14.contains("Coalesce 1"), p14)
    val p16 = plan("t16_bpe_apply")
    assert(p16.contains("MapPartitions") && p16.contains("Coalesce 1"), p16)
    assert(p16.contains("BroadcastHashJoin [word#"), p16)
  }

  test("t21: corpus aggregates once into (doc, bigram) counts; margins broadcast") {
    val p = plan("t21_perplexity")
    // the single corpus-scale exchange is the (doc_id, w1, w2) rollup
    assert("hashpartitioning\\(doc_id#\\d+L?, w1#".r.findFirstIn(p).isDefined, p)
    // c1 margin and the vocab scalar ride broadcasts, not joins-by-shuffle
    assert("BroadcastExchange".r.findAllIn(p).size >= 2, p)
    assert(!p.toLowerCase.contains("cartesianproduct"), p)
  }

  test("t20: one-pass S x S overlap — no checkpoint, diagonal via window") {
    val p = plan("t20_source_overlap")
    // single job: no materialized-RDD scan (the r6 shape checkpointed the
    // shingle-type relation to consume it twice)
    assert(!p.contains("Scan ExistingRDD"), p)
    assert(p.contains("Window"), p)
    assert(p.contains("hashpartitioning(h#"), p)
  }

  // ---- round-8 shapes: the exchange cuts must not silently regress ----

  test("t8: native tokenizer kernel, no token explode, stats broadcast") {
    val p = plan("t8_bm25")
    assert(p.contains("token_term_counts"), p)
    assert(!p.contains("Generate explode"), p) // the r7 shape exploded every token
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
  }

  test("q16: no pre-distinct exchange, dims broadcast, one grouped distinct") {
    val p = plan("q16_supplier_cnt")
    // both dimension probes broadcast; the only exchanges belong to the
    // count(DISTINCT) two-level aggregate
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p)
    assert(!p.toLowerCase.contains("cartesianproduct"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q21: single corpus pass — no Expand, no probe-side rescan") {
    val p = plan("q21_waiting")
    assert(!p.contains("Expand"), p) // countDistinct x2 would plan one
    // lineitem is scanned once: the decorrelated aggregate feeds the
    // supplier rollup directly instead of semi-joining a second scan
    assert("Scan parquet [^\\n]*lineitem".r.findAllIn(p).size == 1, p)
    assert(p.contains("EqualTo(o_orderstatus,F)"), p)
  }

  test("q20: everything derives from ONE basket aggregate (no checkpoint, no re-scan fan-out)") {
    val p = plan("q20_basket_lift")
    // r8 planned four independent lineitem scans (pairs, np twice, n);
    // r9 derives the pair explode, part frequencies, and order count
    // from one basket aggregate whose exchange AQE reuses — so the
    // static plan shows the lineitem scan + basket collect_set, never a
    // checkpoint RDD, and no cartesian anywhere
    assert(!p.contains("Scan ExistingRDD"), p)
    assert(p.contains("collect_set"), p)
    assert(!p.toLowerCase.contains("cartesianproduct"), p)
  }

  test("m8: banded candidates come from bucket equi-joins + top-k") {
    val p = plan("m8_dhash_neardup")
    assert(!p.toLowerCase.contains("cartesianproduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("t24: rank cap is TakeOrderedAndProject, never a vocabulary-wide window") {
    val p = plan("t24_zipf_fit")
    assert(p.contains("TakeOrderedAndProject"), p)
    // the OLS moments collapse in one partial+final aggregate pair, so the
    // only exchanges are the vocab aggregate's and the 1-row final agg's
    assert(!p.toLowerCase.contains("cartesianproduct"), p)
  }

  test("t25/p15: single-scan single-aggregate shapes — no join, row-local scoring") {
    val p25 = plan("t25_classifier_eval")
    assert(!p25.contains("Join"), p25) // scoring is row-local; eval is one aggregate
    assert("Scan parquet [^\\n]*documents".r.findAllIn(p25).size == 1, p25)
    val p15 = plan("p15_shard_manifest")
    assert(!p15.contains("Join"), p15)
    assert("Scan parquet [^\\n]*documents".r.findAllIn(p15).size == 1, p15)
    assert(p15.contains("HashAggregate"), p15)
  }

  test("t26: metrics run on the checkpointed confusion relation, never the corpus") {
    val p = plan("t26_langid_eval")
    // the one corpus scan happened inside the eager confusion checkpoint
    // at build time; the metric plan itself must touch NO parquet — all
    // joins/margins/rollups read the <=15-cell checkpoint leaf
    assert(!p.contains("Scan parquet"), p)
    assert(!p.toLowerCase.contains("cartesianproduct"), p)
  }

  test("d19: prefix verification stays equi-join shaped, no cartesian, no forced broadcast") {
    val p = plan("d19_prefix_join")
    assert(!p.toLowerCase.contains("cartesianproduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // no plan-time broadcast pin on the candidate relation: its size is
    // corpus-dependent (dup-heavy corpora → result-set-many pairs), so
    // AQE must keep the runtime choice
  }

  test("d18: packed shingle arrays merge-join onto the pairs, no corpus broadcast") {
    val p = plan("d18_xmodal_verify")
    assert(!p.contains("BroadcastExchange"), p)
    assert(p.contains("SortMergeJoin"), p)
    assert(!p.toLowerCase.contains("cartesianproduct"), p)
  }

  test("v18: queries broadcast into the range scan, corpus aggregates per query") {
    val p = plan("v18_range_search")
    assert(p.contains("vector_dot"), p)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    // the corpus side must never be the broadcast build
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("p14: the only corpus-sized work is the token count; totals broadcast") {
    val p = plan("p14_mixture_budget")
    assert(p.contains("token_count"), p)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
    assert(!p.contains("Generate explode"), p)
  }

  test("g10: consumes the materialized triangle relation, no cartesian") {
    val p = plan("g10_clustering_coeff")
    // r15: the wedge machinery runs once in the Materialized build;
    // g10's gated plan must be a scan of the node-sized artifact with
    // pushed filters — never a wedge re-join, never a cartesian
    assert(!p.toLowerCase.contains("cartesianproduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("mv-tri"), p)
    assert(p.contains("PushedFilters: [IsNotNull(dg), GreaterThanOrEqual(dg,2)]"), p)
  }

  test("c5: corpus never key-shuffles — the model rides one broadcast row") {
    val p = plan("c5_silhouette")
    // assignment + silhouette are row-local against the broadcast K x 64
    // matrix; the only aggregates are model-sized (cid rollup). A
    // SortMergeJoin or corpus-keyed Exchange would mean the row-local
    // contract broke.
    assert(!p.contains("SortMergeJoin"), p)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
    assert(!p.toLowerCase.contains("cartesianproduct"), p)
  }
}
