package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Similarity search over the `embeddings` table (Array[Float], dim 64).
  *
  * `v1` is the exact brute-force baseline: broadcast the (small) query
  * set, one codegen'd pass over the corpus — at 100 TB this is the
  * pattern for "k queries x N corpus" scoring: the corpus never shuffles,
  * the query side broadcasts, and top-k is a per-query
  * window/aggregation over scores.
  *
  * `v2` is the IVF coarse-quantizer building block: cell centroids
  * (here: label centroids) computed with a posexplode + hash aggregate,
  * then every vector assigned to its nearest cell via a broadcast join
  * against the centroid table. An IVF probe (search only the assigned
  * cell) composes v2's assignment with v1's scoring.
  *
  * All dot products run in DOUBLE with sequential index-order folds on
  * both engines (Spark `aggregate(zip_with(...))` vs DuckDB
  * `list_dot_product(CAST(... AS DOUBLE[]))`) — float32 accumulation
  * differs at 1e-7, which is visible at round-6 output precision.
  */
object SimilarityOps {

  // NOT fanned out (cf. Tables.fanout on the documents loaders): the
  // vector kernels over this table are cheap relative to a stage floor,
  // and the family's codebook/centroid subqueries would each pay the
  // extra exchange — measured net -50% on v5/v8/v14 with fanout
  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")

  /** dot(a, b) folded left in index order, DOUBLE accumulation — the
    * custom codegen'd [[graft.functions.VectorDot]] expression (the
    * equivalent `aggregate(zip_with(...))` HOF chain runs interpreted
    * and blocks whole-stage codegen). */
  private def dot(a: String, b: String): Column =
    graft.functions.vector_dot(col(a), col(b))

  /** sqrt(dot(v, v)) — bit-identical to computing it inside the pair
    * expression (it depends on one row only), so hoisting it to a
    * per-row column removes two of the three dot products from every
    * O(n^2) / O(n*k) pair without perturbing round-6 values. */
  private def withNorm(df: DataFrame): DataFrame =
    df.withColumn("nrm", sqrt(graft.functions.vector_dot(col("embedding"), col("embedding"))))

  /** Collect the (tiny: nSub x nLabels x subDim doubles, ~7 KB) nested
    * PQ codebook and embed it as a LITERAL in the fused kernels. Why
    * not a broadcast-joined column: a joined codebook column rides
    * EVERY corpus row through the encode projection and the scoring
    * join — ~7 KB of UnsafeRow copy per row, measured as the dominant
    * v8 cost at sf1 (JobCensus: 5.4 s wall vs a 1.4 s floor with ZERO
    * shuffle bytes — all row-copy compute). A literal is referenced
    * from generated code with no per-row materialization. The head()
    * is a one-row aggregate collect — the same driver traffic the
    * broadcast already paid (buildBloom precedent). */
  private def codebookLiteral(cb: DataFrame): Column = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types._
    // nest the flat (sub, code, cent) codebook into ONE row — array
    // indexed by sub of code-ascending entries, the shape
    // PqEncode/PqAdc9 scan natively (single aggregate, done here so the
    // three PQ queries cannot drift apart on the nesting scheme)
    val cbn = cb.groupBy()
      .agg(collect_list(struct(col("sub"), col("code"), col("cent"))).as("flat"))
      .select(expr(
        "transform(array_sort(array_distinct(transform(flat, x -> x.sub))), " +
        "s -> array_sort(transform(filter(flat, x -> x.sub = s), " +
        "x -> struct(x.code AS code, x.cent AS cent))))").as("cbn"))
    val raw = cbn.head()
      .getAs[scala.collection.Seq[scala.collection.Seq[org.apache.spark.sql.Row]]](0)
    val ext = raw.map(_.map(r => org.apache.spark.sql.Row(r.getLong(0), r.getSeq[Double](1))))
    val dt = ArrayType(ArrayType(StructType(Seq(
      StructField("code", LongType, nullable = false),
      StructField("cent", ArrayType(DoubleType, containsNull = false), nullable = false))),
      containsNull = false), containsNull = false)
    org.apache.spark.sql.graftbridge.ColumnBridge.column(Literal.create(ext, dt))
  }

  /** IVF coarse quantizer: per-label mean centroids as (cell, centroid) —
    * shared by v2/v3/v6 so the quantizer cannot silently diverge. */
  private def centroids(e: DataFrame): DataFrame =
    e.select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("label"), col("pos"))
      .agg(avg(col("v")).as("cv"))
      .groupBy(col("label"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, cv))), x -> x.cv)").as("centroid"))
      .select(col("label").as("cell"), col("centroid"))

  /** Every vector scored against every centroid (broadcast) and ranked by
    * cosine: (vec_id, embedding, nrm, cell, cos_raw, rk). rk=1 is the IVF
    * assignment; rk<=p gives multi-probe cells. */
  private def rankedCells(e: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wA = Window.partitionBy(col("vec_id")).orderBy(round(col("cos_raw"), 6).desc, col("cell"))
    withNorm(e).join(
        broadcast(centroids(e).withColumn("cn",
          sqrt(graft.functions.vector_dot(col("centroid"), col("centroid"))))))
      .select(col("vec_id"), col("embedding"), col("nrm"), col("cell"),
        (dot("embedding", "centroid") / (col("nrm") * col("cn"))).as("cos_raw"))
      .withColumn("rk", row_number().over(wA))
  }

  /** The IVF coarse assignment as a [[Materialized]] artifact:
    * (vec_id, cell, rk) for rk <= 3 — exactly what a deployed IVF index
    * persists (FAISS's invlists). v2/v3/v6/v14/v17 each re-scored every
    * vector against every centroid to re-derive this; the build pays
    * [[rankedCells]]' n x K window once per corpus, and every consumer
    * is a scan + equi-join back to the vector columns it needs. rk <= 3
    * covers the widest probe any consumer sweeps (v17's curve). */
  private def ivfAssign(s: SparkSession, dir: String): DataFrame =
    Materialized.rel(s, s"ivfassign-${Materialized.dirTag(s, dir)}") {
      rankedCells(emb(s, dir)).filter(col("rk") <= 3)
        .select(col("vec_id"), col("cell"), col("rk"))
    }

  /** IVF cell-occupancy histogram: (cell, n) over the rk=1 assignment —
    * the skew monitor for every O(sum cell^2) consumer (v16's kNN self-
    * join, v2/v3/v6's cell routing). The cell count K is the documented
    * scale lever (raise K until max-cell pairs fit a task), but the lever
    * only works if the quantizer SPREADS: a degenerate centroid seed
    * that swallows the corpus into one cell turns the self-join into
    * O(n^2) on one task. `IvfSkewSpec` gates max/mean occupancy and the
    * max cell's share of pair work at sf0.1; the `ivf` family of
    * `QueryScaleRehearsal` re-measures both at 8x corpus. At production,
    * run this (one aggregate over the assignment) before the pair scan
    * and re-seed/raise K when the bound trips. */
  def cellHistogram(e: DataFrame): DataFrame =
    rankedCells(e).filter(col("rk") === 1)
      .groupBy(col("cell")).agg(count(lit(1)).as("n"))

  /** v16's target cell occupancy: K = ceil(n / this). Constant occupancy
    * is the scale contract — the cell self-join's pair work stays LINEAR
    * in the corpus (n x occupancy), instead of the fixed-K quadratic
    * blow-up the round-9 rehearsal measured at 31.7x wall for 8x data. */
  private[graft] val KnnCellTarget = 64

  /** The v16 kNN-graph pair scan with K DERIVED FROM CORPUS SIZE: the
    * quantizer is K = ceil(n / 64) exemplar vectors chosen by md5 rank
    * over vec_id (v11's SemDeDup idiom — deterministic, oracle-
    * mirrorable, and re-seeding for a grown corpus is just re-running
    * the selection; no training loop). n comes from one count(*) —
    * answered from parquet footers at any scale, so the two-pass shape
    * costs metadata, not a data scan. Assignment is v17's max-struct
    * argmax (no n x K rank window); the self-join stays cell-keyed,
    * O(n x occupancy) by the K formula. Exemplar scoring is n x K dot
    * products = O(n^2 / 64) — fine to ~10^7 vectors per partition-
    * parallel pass; beyond that the documented lever is a hierarchical
    * (two-level) quantizer, not a bigger K target. */
  def knnGraphOf(e: DataFrame): DataFrame = {
    val n = e.count()
    knnGraphOfK(e, math.max(1, math.ceil(n.toDouble / KnnCellTarget).toInt))
  }

  /** md5-rank exemplar codebook: the K vectors with the smallest
    * md5(vec_id) hex, as (cell = exemplar vec_id, ce, cn). Bounded
    * TakeOrderedAndProject, broadcast by the caller. */
  private[graft] def exemplarCodebook(e: DataFrame, k: Int): DataFrame =
    withNorm(e.select(col("vec_id"), col("embedding")))
      .withColumn("m", md5(col("vec_id").cast("string")))
      .orderBy(col("m")).limit(k)
      .select(col("vec_id").as("cell"), col("embedding").as("ce"),
        col("nrm").as("cn"))

  /** v16's assignment under an explicit K (exposed so the scale
    * rehearsal can pin the fixed-K failure mode against the gated
    * auto-K plan): argmax cosine over the broadcast exemplar codebook,
    * tiebreak (round-6 cos desc, cell asc) — identical to a rank
    * window's rk=1 without sorting n x K rows. */
  private[graft] def knnAssignedK(e: DataFrame, k: Int): DataFrame =
    withNorm(e).join(broadcast(exemplarCodebook(e, k)))
      .select(col("vec_id"), col("embedding"), col("nrm"),
        (dot("embedding", "ce") / (col("nrm") * col("cn"))).as("cos_raw"),
        col("cell"))
      .groupBy(col("vec_id"))
      .agg(max(struct(round(col("cos_raw"), 6).as("c"),
          (-col("cell")).as("negc"), col("cell").as("cell"))).as("top"),
        first(col("embedding")).as("embedding"), first(col("nrm")).as("nrm"))
      .select(col("top.cell").as("cell"), col("vec_id"), col("embedding"),
        col("nrm"))

  /** Cell-occupancy histogram of v16's exemplar quantizer at a given K
    * (the skew monitor for its O(sum cell^2) self-join, `IvfSkewSpec`). */
  def knnCellHistogram(e: DataFrame, k: Int): DataFrame =
    knnAssignedK(e, k).groupBy(col("cell")).agg(count(lit(1)).as("n"))

  private[graft] def knnGraphOfK(e: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // eager checkpoint before the self-join — without it the argmax
    // aggregate (and the exemplar scoring under it) re-executes once per
    // join side, g3's edge-list precedent
    val assigned = knnAssignedK(e, k).localCheckpoint(true)
    val rhs = assigned.select(col("cell"), col("vec_id").as("nid"),
      col("embedding").as("ne"), col("nrm").as("nn"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(round(col("cos_raw"), 6).desc, col("nid"))
    assigned.join(rhs, Seq("cell"))
      .filter(col("vec_id") =!= col("nid"))
      .select(col("vec_id"), col("nid"),
        (dot("embedding", "ne") / (col("nrm") * col("nn"))).as("cos_raw"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("vec_id"), col("rk"), col("nid"),
        round(col("cos_raw"), 6).as("cos"))
      .orderBy(col("vec_id"), col("rk"))
  }

  /** v4's blocked exact near-dup pair scan: all (id1 < id2) embedding
    * pairs with round-6 cosine >= 0.45, as (id1, id2, cos) — shared with
    * d18's cross-modal verification (DedupOps) so the candidate surface
    * cannot drift from the gated v4 query. */
  /** The blocked exact near-dup pair relation (cos >= 0.45 survivors),
    * shared by v4 (its whole result) and d18 (its candidate generator) —
    * a Materialized artifact (r15): the build is the O(n^2/B) blocked
    * scoring scan, the output is pair-work-bounded and tiny relative to
    * the corpus, so both consumers read a stats-carrying parquet scan
    * instead of re-running the quadratic pass. */
  private[graft] def neardupPairs(s: SparkSession, dir: String): DataFrame =
    Materialized.rel(s, s"neardup-${Materialized.dirTag(s, dir)}") {
      neardupPairsBuild(s, dir)
    }

  private def neardupPairsBuild(s: SparkSession, dir: String): DataFrame = {
    val nBlocks = s.sparkContext.defaultParallelism
    val e = withNorm(emb(s, dir).select(col("vec_id"), col("embedding")))
    val left = e.select(col("vec_id").as("id1"), col("embedding").as("e1"),
        col("nrm").as("n1"),
        explode(expr(s"sequence(0, ${nBlocks - 1})")).as("blk"))
    val right = e.select(col("vec_id").as("id2"), col("embedding").as("e2"),
        col("nrm").as("n2"), pmod(col("vec_id"), lit(nBlocks)).as("blk"))
    // shuffled HASH join, not sort-merge: every row of a block shares
    // one join key, and SMJ's duplicate-key group buffering costs ~2x
    // the whole query here (measured 3.6 s vs 1.6 s at sf0.1, B=32) —
    // the hash build of n/B rows per partition is the cheap direction.
    // RETAINED through the r18 100x SHJ purge: unlike the dedup
    // join-backs, this build side is BLOCK-bounded (n/B rows where
    // B = defaultParallelism scales with the cluster), and with one
    // shared key per block SMJ's group buffer would hold the same n/B
    // rows anyway — there is no spill-safer algorithm for this shape.
    val pairs = left.join(right.hint("shuffle_hash"),
        left("blk") === right("blk") && col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        (graft.functions.vector_dot(col("e1"), col("e2")) /
          (col("n1") * col("n2"))).as("cos_raw"))
    pairs.filter(round(col("cos_raw"), 6) >= 0.45)
      .select(col("id1"), col("id2"), round(col("cos_raw"), 6).as("cos"))
  }

  /** 16 random hyperplanes for sign-bit LSH (Charikar '02). Components
    * are md5-derived so the oracle recomputes the identical planes:
    * w(b,i) = int(md5("b_i")[0:8], 16) / 2^31 - 1  in [-1, 1). */
  private[graft] lazy val planes: Array[Array[Double]] = Array.tabulate(16, 64) { (b, i) =>
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"${b}_${i}".getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex, 16) / 2147483648.0 - 1.0
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // --- exact cosine top-3 neighbors for 5 query vectors ---
    // --- filtered vector search (PRE-filtering): top-3 neighbors among
    //     only the vectors satisfying a metadata predicate (label = 3,
    //     ~5% selective). The predicate applies BEFORE scoring — always
    //     exactly k results when k exist, unlike post-filtering a top-k'
    //     — and lands in the parquet scan as a pushed filter, so the
    //     engine reads only the eligible slice. In a dedicated vector
    //     store, composing filters with the index is the hard case;
    //     in a relational plan it is one Filter node ahead of the
    //     broadcast scoring join. ---
    "v12_filtered_topk" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val e = withNorm(emb(s, dir).filter(col("label") === 3))
        .select(col("vec_id").as("eid"), col("embedding").as("ee"), col("nrm").as("en"))
      val q = withNorm(emb(s, dir).filter(col("vec_id") < 5))
        .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("nrm").as("qn"))
      val scored = broadcast(q).join(e, col("qid") =!= col("eid"))
        .select(col("qid"), col("eid"),
          (dot("qe", "ee") / (col("qn") * col("en"))).as("cos_raw"))
      val w = Window.partitionBy(col("qid")).orderBy(round(col("cos_raw"), 6).desc, col("eid"))
      scored.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("qid"), col("eid"), round(col("cos_raw"), 6).as("cos"), col("rk"))
        .orderBy(col("qid"), col("rk"))
    }),

    "v1_cosine_topk" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val e = withNorm(emb(s, dir))
        .select(col("vec_id").as("eid"), col("embedding").as("ee"), col("nrm").as("en"))
      val q = withNorm(emb(s, dir).filter(col("vec_id") < 5))
        .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("nrm").as("qn"))
      val scored = broadcast(q).join(e, col("qid") =!= col("eid"))
        .select(col("qid"), col("eid"),
          (dot("qe", "ee") / (col("qn") * col("en"))).as("cos_raw"))
      val w = Window.partitionBy(col("qid")).orderBy(round(col("cos_raw"), 6).desc, col("eid"))
      scored.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("qid"), col("eid"), round(col("cos_raw"), 6).as("cos"), col("rk"))
        .orderBy(col("qid"), col("rk"))
    }),

    // --- cosine RANGE search (radius query): for each query vector, the
    //     count / mean / max similarity of all corpus vectors within
    //     cos >= 0.2 — the fixed-threshold dual of top-k (dedup sweeps
    //     and recall audits ask "everything this similar", not "the k
    //     nearest"). Same 100 TB shape as v1: queries broadcast, corpus
    //     scanned once with the codegen'd dot product, and the result is
    //     a per-query aggregate so nothing ever shuffles at corpus grain.
    //     The threshold compares the round-6 value (what both engines
    //     output), so a 1e-7 float tail can't flip membership. ---
    "v18_range_search" -> ((s, dir) => {
      val e = withNorm(emb(s, dir))
        .select(col("vec_id").as("eid"), col("embedding").as("ee"), col("nrm").as("en"))
      val q = withNorm(emb(s, dir).filter(col("vec_id") < 8))
        .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("nrm").as("qn"))
      broadcast(q).join(e, col("qid") =!= col("eid"))
        .select(col("qid"),
          round(dot("qe", "ee") / (col("qn") * col("en")), 6).as("cos"))
        .filter(col("cos") >= 0.2)
        .groupBy(col("qid"))
        .agg(count(lit(1)).cast("long").as("n_in_range"),
          // t8/a10's drift guard: the round-6 cos values aggregate as
          // exact micro-unit longs, so avg_cos cannot flip at a round-6
          // boundary with partition arrival order
          round(sum(expr("CAST(round(cos * 1e6) AS BIGINT)")) / count(lit(1)) / 1e6, 6)
            .as("avg_cos"),
          round(max(col("cos")), 6).as("max_cos"))
        .orderBy(col("qid"))
    }),

    // --- IVF coarse quantizer: nearest-centroid assignment counts ---
    "v2_ivf_assign" -> ((s, dir) => {
      // r15: the assignment reads the shared ivfAssign artifact (built
      // once from rankedCells — identical rows to the max-struct argmax
      // this query previously ran, per the r11 A/B); label rejoins from
      // the corpus scan by vec_id
      ivfAssign(s, dir).filter(col("rk") === 1)
        .join(emb(s, dir).select(col("vec_id"), col("label")), Seq("vec_id"))
        .select(col("label"), col("cell").cast("int").as("cell"))
        .groupBy(col("label"), col("cell"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("label"), col("cell"))
    }),

    // --- SemDeDup (Abbas et al. '23): semantic dedup = cluster the
    //     embedding space, then prune near-duplicates ONLY within each
    //     cluster — the trick that turns v4's O(n^2) exact pass into
    //     O(n^2 / K) while catching the semantically-close mass (cross-
    //     cluster pairs are far by construction). Exemplar "centroids"
    //     are the K=32 vectors with smallest md5(vec_id) — deterministic
    //     and oracle-recomputable, where a Lloyd's k-means seed would be
    //     RNG-dependent; assignment is one broadcast join + per-vector
    //     top-1, and the within-cluster pair scan is an equi-join ON THE
    //     CLUSTER ID (shuffle-hash, never a cross join). A member is
    //     dropped when a same-cluster smaller-id member sits at cosine
    //     >= 0.35. K is the scale lever: at 100 TB raise K so n/K rows
    //     fit a task (the paper runs K ~ 10^5). ---
    "v11_semdedup" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val e = withNorm(emb(s, dir))
      val cents = e
        .orderBy(md5(col("vec_id").cast("string")), col("vec_id")).limit(32)
        .select(col("vec_id").as("cell"), col("embedding").as("ce"), col("nrm").as("cn"))
      val wA = Window.partitionBy(col("vec_id"))
        .orderBy(round(col("cos_raw"), 6).desc, col("cell"))
      val assigned = e.join(broadcast(cents))
        .select(col("vec_id"), col("embedding"), col("nrm"), col("cell"),
          (dot("embedding", "ce") / (col("nrm") * col("cn"))).as("cos_raw"))
        .withColumn("rk", row_number().over(wA))
        .filter(col("rk") === 1)
        .select(col("cell"), col("vec_id"), col("embedding"), col("nrm"))
      val a = assigned.select(col("cell"), col("vec_id").as("ida"),
        col("embedding").as("ea"), col("nrm").as("na"))
      val b = assigned.select(col("cell"), col("vec_id").as("idb"),
        col("embedding").as("eb"), col("nrm").as("nb"))
      val dropped = a.join(b.hint("shuffle_hash"), Seq("cell"))
        .filter(col("ida") < col("idb"))
        .filter(round(dot("ea", "eb") / (col("na") * col("nb")), 6) >= 0.35)
        .select(col("cell"), col("idb")).distinct()
      assigned.select(col("cell"), col("vec_id"))
        .join(dropped.withColumnRenamed("idb", "vec_id")
          .withColumn("dropped", lit(1)), Seq("cell", "vec_id"), "left")
        .groupBy(col("cell"))
        .agg(count(lit(1)).as("n_members"),
          sum(coalesce(col("dropped"), lit(0))).cast("long").as("n_dropped"))
        .orderBy(col("cell"))
    }),

    // --- embedding-cosine near-duplicate pairs, EXACT (an LSH candidate
    //     set is not a substitute: on this corpus v5's banded RHP-LSH
    //     recalls only ~half of the >= 0.45 pairs — measured 70 of 144 at
    //     sf0.1 — so the exact audit must score every pair). The O(n^2)
    //     work is partitioned as a BLOCKED pair join, not a nested-loop
    //     broadcast: vectors land in B hash blocks, the left side
    //     replicates to every block key, and a shuffled equi-join on the
    //     block id gives each task one (all, block_b) slab — per-task
    //     build memory is n/B rows instead of the whole corpus, and the
    //     quadratic scoring spreads evenly across B tasks. At 100 TB the
    //     approximate path is v5/v6; this is the shape an exact pass has
    //     to take when it is required at all. ---
    "v4_embedding_neardup" -> ((s, dir) =>
      neardupPairs(s, dir).orderBy(col("id1"), col("id2"))),

    // --- random-hyperplane (sign-bit) LSH near-dup: 16 plane bits,
    //     4 bands x 4 bits, bucket-join candidates, exact-cosine
    //     confirmation on survivors only. The scale path v4 documents:
    //     candidate generation is a self-equi-join on (band, bucket) —
    //     one shuffle on a high-cardinality key, never O(n^2); the
    //     quadratic exact scorer runs only inside buckets. ---
    "v5_rhp_lsh" -> ((s, dir) => {
      // no cache: a closure-registered cache() can never be unpersisted
      // (the API returns a lazy DataFrame) and the entry outlives the
      // query for the whole session — re-scanning the pruned parquet
      // twice is cheaper than that leak at every scale
      val e = withNorm(emb(s, dir).select(col("vec_id"), col("embedding")))
      // 16 sign bits -> one 16-bit signature per vector, row-local
      val sig = e.select(col("vec_id"),
        (0 until 16).map { b =>
          when(round(graft.functions.vector_dot(col("embedding"), typedLit(planes(b).toSeq)), 6) >= 0,
            lit(1L << b)).otherwise(lit(0L))
        }.reduce(_ + _).as("sig"))
      // band keys: 4 bands of 4 bits — a narrow explode (4 rows/vector)
      val bands = sig
        .select(col("vec_id"), explode(expr("sequence(0, 3)")).as("band"), col("sig"))
        .select(col("vec_id"), col("band"), expr("shiftright(sig, band * 4) & 15").as("bkey"))
      // same-bucket ordered pairs, dedup'd across bands
      val cand = bands.groupBy(col("band"), col("bkey"))
        .agg(sort_array(collect_list(col("vec_id"))).as("ids"))
        .filter(size(col("ids")) > 1)
        .select(explode(expr(
          "flatten(transform(ids, a -> transform(filter(ids, b -> b > a), b -> struct(a AS id1, b AS id2))))"))
          .as("p"))
        .select(col("p.id1").as("id1"), col("p.id2").as("id2"))
        .distinct()
      // merge (r18 100x purge): the banded candidate set is corpus-
      // proportional and generate-fed (blind estimate -> spurious
      // broadcast), and the embedding side is the corpus itself —
      // neither may broadcast or hash-build; SMJ's sorts spill.
      // r19 bounded-side audit (VERDICT r18 ask #4): un-forcing per the
      // d4 precedent was REJECTED. d4's sides are stats-carrying
      // artifacts with a structural bound; v5 has none — the signature
      // space is a CONSTANT 64 buckets (4 bands x 4-bit keys), so the
      // candidate relation scales TH(n^2/16) with no bucket cap (a cap
      // would drop candidates and change the gated result), and both
      // join sides grow with the corpus. Any hash build here re-opens
      // the exact non-spillable class the sf10 gate OOM'd; the ~0.4 s
      // sort cost at sf0.1 is the price of a plan that survives 100x.
      val conf = cand
        .join(e.select(col("vec_id").as("id1"), col("embedding").as("e1"), col("nrm").as("n1"))
          .hint("merge"), Seq("id1"))
        .join(e.select(col("vec_id").as("id2"), col("embedding").as("e2"), col("nrm").as("n2"))
          .hint("merge"), Seq("id2"))
        .select(col("id1"), col("id2"),
          (graft.functions.vector_dot(col("e1"), col("e2")) / (col("n1") * col("n2"))).as("cos_raw"))
      conf.filter(round(col("cos_raw"), 6) >= 0.45)
        .select(col("id1"), col("id2"), round(col("cos_raw"), 6).as("cos"))
        .orderBy(col("id1"), col("id2"))
    }),

    // --- int8 scalar quantization + exact rerank: the memory-side ANN
    //     lever (a 64-dim float corpus shrinks 4x; at 100 TB the int8
    //     corpus is what stays hot). Per-dimension min/max bounds are a
    //     tiny broadcast; quantized vectors are exact small integers in
    //     DOUBLE, so the same codegen'd vector_dot scores them and the
    //     oracle reproduces every value bit-exactly. Approximate top-10
    //     candidates per query are reranked by exact cosine to top-3 —
    //     candidate generation touches only quantized data, full floats
    //     are read for ~10 rows per query. ---
    "v7_sq8_rerank" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val e = withNorm(emb(s, dir))
      val bounds = e.select(posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy(col("pos"))
        .agg(min(col("v")).as("lov"), max(col("v")).as("hiv"))
        .groupBy()
        .agg(expr("transform(array_sort(collect_list(struct(pos, lov))), x -> CAST(x.lov AS DOUBLE))").as("lo"),
          expr("transform(array_sort(collect_list(struct(pos, hiv))), x -> CAST(x.hiv AS DOUBLE))").as("hi"))
      val q = e.crossJoin(broadcast(bounds))
        .select(col("vec_id"), col("embedding"), col("nrm"),
          // a dimension constant across the corpus (hi = lo) would divide
          // by zero: Spark yields NaN and the oracle errors on the BIGINT
          // cast — quantize such dims to 0 with the SAME expression on
          // both engines so they cannot diverge
          expr("transform(sequence(0, size(embedding) - 1), " +
            "i -> CASE WHEN hi[i] = lo[i] THEN 0.0D ELSE " +
            "CAST(floor((CAST(embedding[i] AS DOUBLE) - lo[i]) * 255.0 / (hi[i] - lo[i]) + 0.5D) AS DOUBLE) END)")
            .as("qv"))
      val queries = q.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"),
          col("nrm").as("qn"), col("qv").as("qqv"))
      val wI = Window.partitionBy(col("qid")).orderBy(col("iscore").desc, col("eid"))
      val cand = broadcast(queries).join(q, col("qid") =!= col("vec_id"))
        .select(col("qid"), col("qe"), col("qn"), col("vec_id").as("eid"),
          col("embedding").as("ee"), col("nrm").as("en"),
          graft.functions.vector_dot(col("qqv"), col("qv")).cast("long").as("iscore"))
        .withColumn("irk", row_number().over(wI))
        .filter(col("irk") <= 10)
      val wC = Window.partitionBy(col("qid")).orderBy(round(col("cos_raw"), 6).desc, col("eid"))
      cand
        .select(col("qid"), col("eid"),
          (dot("qe", "ee") / (col("qn") * col("en"))).as("cos_raw"))
        .withColumn("rk", row_number().over(wC))
        .filter(col("rk") <= 3)
        .select(col("qid"), col("eid"), round(col("cos_raw"), 6).as("cos"), col("rk"))
        .orderBy(col("qid"), col("rk"))
    }),

    // --- product quantization + asymmetric distance computation (ADC):
    //     the other canonical 100 TB ANN compression (Jegou et al. '11).
    //     64 dims split into 8 subspaces of 8; per-subspace codebooks are
    //     the label sub-centroids (deterministic, like v2's quantizer, so
    //     the oracle recomputes them bit-for-bit); each corpus vector
    //     stores only 8 small codes. Queries stay full-precision and
    //     score against the BROADCAST codebook: ADC(q, x) = sum_s
    //     dot(q_s, codebook[s][code_s(x)]). Per-subspace partials are
    //     summed as scaled integers so the 8-double sum stays
    //     aggregation-order-independent. Corpus bytes per vector: 8
    //     codes instead of 64 floats — the table that stays in memory at
    //     100 TB. ---
    "v8_pq_adc" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val subDim = 8
      val e = emb(s, dir)
      // per-(label, subspace) sub-centroids as double arrays
      val cb = e.select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy(col("label"), col("pos")).agg(avg(col("v")).as("cv"))
        .groupBy(col("label"), (col("pos") / subDim).cast("int").as("sub"))
        .agg(expr("transform(array_sort(collect_list(struct(pos, cv))), x -> x.cv)").as("cent"))
        .select(col("sub"), col("label").cast("long").as("code"), col("cent"))
      // encode + score are MAP-ONLY over the corpus scan: pq_encode
      // replaces the n x nSub explode -> broadcast-join -> max_by hash
      // aggregate (a corpus-sized shuffle), pq_adc9 replaces the
      // n x nSub x nQ partial-row explode and its (qid, eid) aggregate —
      // both kernels arithmetic-identical to the composed pipeline they
      // fused (PqKernels scaladoc), so the unchanged oracle still gates
      // every value. Nothing corpus-sized shuffles until the ranked
      // (qid, eid, adc9) rows hit the top-3 window.
      val cbL = codebookLiteral(cb)
      // the HOF cast looks like a codegen defect but is the EMPIRICAL
      // winner (r20 ProbeV8Cast + filtered A/B): it is CodegenFallback,
      // which keeps the encode projection OUT of the cross-join's
      // whole-stage span — with a native array<double> cast the span
      // fuses Project(pq_encode) + BroadcastNestedLoopJoin +
      // Project(pq_adc9) with TWO ~7 KB codebook literals into one
      // generated method, and v8 regressed 0.66 -> 0.90 s (v9
      // 0.90 -> 1.25) — the huge-generated-method class. The isolated
      // encode projection IS faster codegen'd (ProbeV8Cast: 0.187 vs
      // 0.245 s), so if Spark ever splits giant spans this flips.
      val ev = e.select(col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("ev"))
      val coded = ev.filter(col("vec_id") >= 5)
        .select(col("vec_id").as("eid"),
          graft.functions.pq_encode(col("ev"), cbL).as("codes"))
      val queriesQ = ev.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("ev").as("qv"))
      val wQ = Window.partitionBy(col("qid")).orderBy(col("adc9").desc, col("eid"))
      coded.crossJoin(broadcast(queriesQ))
        .select(col("qid"), col("eid"),
          graft.functions.pq_adc9(col("qv"), col("codes"), cbL).as("adc9"))
        .withColumn("rk", row_number().over(wQ))
        .filter(col("rk") <= 3)
        .select(col("qid"), col("eid"), round(col("adc9") / 1e9, 6).as("adc"), col("rk"))
        .orderBy(col("qid"), col("rk"))
    }),

    // --- rotation-PQ: OPQ's random-rotation baseline (Ge et al. '13 —
    //     a rotation before PQ redistributes correlated dimensions across
    //     subspaces and cuts quantization error; full OPQ learns R by
    //     SVD, the standard cheap baseline draws a random orthogonal R).
    //     Here R is a deterministic SIGNED PERMUTATION — dims reordered
    //     by the md5 rank of their index, signs flipped by a hex digit —
    //     which is orthogonal by construction and md5-derived so the
    //     oracle recomputes it bit-for-bit. Everything downstream is
    //     v8's PQ+ADC pipeline over the rotated vectors: codebooks
    //     broadcast, corpus stores 8 codes/vector, order-independent
    //     scaled-integer partial sums. ---
    "v9_pq_rot" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val subDim = 8
      // signed permutation COMPUTED ON THE DRIVER (64 md5 calls), then
      // inlined as array LITERALS in the same transform() the r19 form
      // used. The r19 shape derived (pi, ps) as a one-row Spark
      // aggregate and crossJoin(broadcast(pm))'d it onto the corpus —
      // two extra jobs plus a BroadcastNestedLoopJoin in the encode
      // path for a deterministic 64-entry table (r20 filtered A/B:
      // 0.90 -> 0.69 s). Identical values: same md5 hex, same
      // (h, i, sg) ascending sort (unique ASCII hex keys compare
      // identically in UTF8 and UTF-16), same ps[j] *
      // CAST(embedding[pi[j]] AS DOUBLE) arithmetic per element —
      // asserted against the SQL form in RotationPermutationSpec and
      // gated by v9's unchanged oracle.
      // The transform() HOF is KEPT deliberately: it is CodegenFallback
      // and acts as the codegen barrier that keeps the encode
      // projection OUT of the cross-join's whole-stage span — a
      // codegen'd static-array variant fused Project(pq_encode) + BNLJ
      // + Project(pq_adc9) with two ~7 KB codebook literals into one
      // generated method and REGRESSED v9 0.90 -> 1.25 s (v8
      // 0.66 -> 0.90 with the analogous native cast; both measured and
      // reverted, r20 — the huge-generated-method class).
      val perm = (0 until 64).map { i =>
        val h = java.security.MessageDigest.getInstance("MD5")
          .digest(s"rot$i".getBytes("UTF-8")).map("%02x".format(_)).mkString
        (h, i, if (h.charAt(1) <= '7') 1.0 else -1.0)
      }.sortBy(_._1)
      val piLit = perm.map(_._2).mkString("array(", ", ", ")")
      val psLit = perm.map(_._3).map(v => s"${v}D").mkString("array(", ", ", ")")
      val e = emb(s, dir)
        .select(col("vec_id"), col("label"),
          expr(s"transform(sequence(0, 63), j -> $psLit[j] * " +
            s"CAST(embedding[$piLit[j]] AS DOUBLE))").as("embedding"))
      val cb = e.select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy(col("label"), col("pos")).agg(avg(col("v")).as("cv"))
        .groupBy(col("label"), (col("pos") / subDim).cast("int").as("sub"))
        .agg(expr("transform(array_sort(collect_list(struct(pos, cv))), x -> x.cv)").as("cent"))
        .select(col("sub"), col("label").cast("long").as("code"), col("cent"))
      // everything downstream is v8's fused map-only encode + ADC over
      // the rotated vectors (see v8_pq_adc's plan note): the codebook
      // collected once into a codegen literal, pq_encode/pq_adc9 in the
      // scan projection, no corpus-sized shuffle before the top-3 window
      val cbL = codebookLiteral(cb)
      val ev = e.select(col("vec_id"), col("embedding").as("ev"))
      val coded = ev.filter(col("vec_id") >= 5)
        .select(col("vec_id").as("eid"),
          graft.functions.pq_encode(col("ev"), cbL).as("codes"))
      val queriesQ = ev.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("ev").as("qv"))
      val wQ = Window.partitionBy(col("qid")).orderBy(col("adc9").desc, col("eid"))
      coded.crossJoin(broadcast(queriesQ))
        .select(col("qid"), col("eid"),
          graft.functions.pq_adc9(col("qv"), col("codes"), cbL).as("adc9"))
        .withColumn("rk", row_number().over(wQ))
        .filter(col("rk") <= 3)
        .select(col("qid"), col("eid"), round(col("adc9") / 1e9, 6).as("adc"), col("rk"))
        .orderBy(col("qid"), col("rk"))
    }),

    // --- binary (sign-bit) quantization + Hamming candidates + exact
    //     rerank: the most aggressive ANN compression — one BIT per
    //     dimension (64x vs float32), the corpus scan is xor + popcount.
    //     Codes are sign bits against the per-dimension corpus mean
    //     (centering balances the bits), packed as TWO 32-bit words so
    //     the oracle's BIGINT shifts never touch bit 63 — which is also
    //     the realistic layout (>64-dim codes are word arrays). Top-10
    //     Hamming candidates per query rerank by exact cosine to top-3:
    //     full floats are read for ~10 rows/query, the scan touches only
    //     16 bytes/vector. ---
    "v10_bq_hamming" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val e = withNorm(emb(s, dir))
      val mu = e.select(posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy(col("pos")).agg(avg(col("v")).as("m"))
        .groupBy()
        .agg(expr("transform(array_sort(collect_list(struct(pos, m))), x -> x.m)").as("mu"))
      val coded = e.crossJoin(broadcast(mu))
        .select(col("vec_id"), col("embedding"), col("nrm"),
          expr("aggregate(sequence(0, 31), 0L, (acc, i) -> acc + " +
            "CASE WHEN CAST(embedding[i] AS DOUBLE) > mu[i] THEN shiftleft(1L, i) ELSE 0L END)")
            .as("code_lo"),
          expr("aggregate(sequence(32, 63), 0L, (acc, i) -> acc + " +
            "CASE WHEN CAST(embedding[i] AS DOUBLE) > mu[i] THEN shiftleft(1L, i - 32) ELSE 0L END)")
            .as("code_hi"))
      val queries = coded.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("nrm").as("qn"),
          col("code_lo").as("qlo"), col("code_hi").as("qhi"))
      val wH = Window.partitionBy(col("qid")).orderBy(col("ham"), col("eid"))
      val cand = broadcast(queries).join(coded, col("qid") =!= col("vec_id"))
        .select(col("qid"), col("qe"), col("qn"), col("vec_id").as("eid"),
          col("embedding").as("ee"), col("nrm").as("en"),
          (expr("CAST(bit_count(qlo ^ code_lo) AS BIGINT)") +
            expr("CAST(bit_count(qhi ^ code_hi) AS BIGINT)")).as("ham"))
        .withColumn("hrk", row_number().over(wH))
        .filter(col("hrk") <= 10)
      val wC = Window.partitionBy(col("qid")).orderBy(round(col("cos_raw"), 6).desc, col("eid"))
      cand
        .select(col("qid"), col("eid"), col("ham"),
          (dot("qe", "ee") / (col("qn") * col("en"))).as("cos_raw"))
        .withColumn("rk", row_number().over(wC))
        .filter(col("rk") <= 3)
        .select(col("qid"), col("eid"), col("ham"),
          round(col("cos_raw"), 6).as("cos"), col("rk"))
        .orderBy(col("qid"), col("rk"))
    }),

    // --- IVF probe: ANN top-3 searching ONLY the query's nearest cell.
    //     Composes v2's coarse quantizer with v1's scoring: the corpus is
    //     pre-partitioned by cell, the probe scores ~1/nCells of it.
    //     This is the 100 TB ANN path: assignment is a one-off batch job,
    //     probes touch one cell partition each. ---
    "v3_ivf_topk" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      // assignment of every vector (and thereby of the queries), read
      // from the shared ivfAssign artifact; vectors rejoin by vec_id
      val assigned = ivfAssign(s, dir).filter(col("rk") === 1)
        .join(withNorm(emb(s, dir)), Seq("vec_id"))
        .select(col("vec_id"), col("embedding"), col("nrm"), col("cell"))
      val queries = assigned.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("nrm").as("qn"), col("cell"))
      // probe: score only the query's own cell
      val corpus = assigned.select(
        col("vec_id").as("eid"), col("embedding").as("ee"), col("nrm").as("en"), col("cell"))
      val wQ = Window.partitionBy(col("qid")).orderBy(round(col("cos_raw"), 6).desc, col("eid"))
      broadcast(queries).join(corpus, Seq("cell"))
        .filter(col("qid") =!= col("eid"))
        .select(col("qid"), col("eid"),
          (dot("qe", "ee") / (col("qn") * col("en"))).as("cos_raw"))
        .withColumn("rk", row_number().over(wQ))
        .filter(col("rk") <= 3)
        .select(col("qid"), col("eid"), round(col("cos_raw"), 6).as("cos"), col("rk"))
        .orderBy(col("qid"), col("rk"))
    }),

    // --- multi-probe IVF: queries search their top-2 cells instead of 1.
    //     The standard recall lever — each probe is still a broadcast of
    //     5 tiny query rows into one cell partition; the corpus (assigned
    //     exactly once to its own top cell) never reshuffles, work scales
    //     as probes/cells, not corpus size. ---
    "v6_ivf_multiprobe" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ia = ivfAssign(s, dir)
      val en = withNorm(emb(s, dir))
      // corpus membership: exactly one cell per vector (its top cell)
      val assigned = ia.filter(col("rk") === 1).join(en, Seq("vec_id"))
        .select(col("vec_id"), col("embedding"), col("nrm"), col("cell"))
      // query probes: the two nearest cells -> (qid, eid) pairs stay
      // unique because each corpus vector lives in exactly one cell
      val probes = ia.filter(col("vec_id") < 5 && col("rk") <= 2).join(en, Seq("vec_id"))
        .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("nrm").as("qn"), col("cell"))
      val corpus = assigned.select(
        col("vec_id").as("eid"), col("embedding").as("ee"), col("nrm").as("en"), col("cell"))
      val wQ = Window.partitionBy(col("qid")).orderBy(round(col("cos_raw"), 6).desc, col("eid"))
      broadcast(probes).join(corpus, Seq("cell"))
        .filter(col("qid") =!= col("eid"))
        .select(col("qid"), col("eid"),
          (dot("qe", "ee") / (col("qn") * col("en"))).as("cos_raw"))
        .withColumn("rk", row_number().over(wQ))
        .filter(col("rk") <= 3)
        .select(col("qid"), col("eid"), round(col("cos_raw"), 6).as("cos"), col("rk"))
        .orderBy(col("qid"), col("rk"))
    }),

    // --- IVF-PQ composed (Jegou et al. '11, the canonical billion-scale
    //     ANN shape): the coarse IVF quantizer prunes the corpus to the
    //     query's 2 probed cells, and ONLY those vectors are scored — by
    //     broadcast-codebook ADC over their 8 stored PQ codes, never
    //     their floats. At 100 TB this is the whole game: candidate
    //     volume is corpus/nCells * nProbe, scoring touches 8 bytes per
    //     candidate, floats are read for nothing (no rerank here; v7
    //     shows the rerank stage). The corpus-sided joins (codes with
    //     assignment) are co-keyed equi-joins on vec_id; every
    //     query-sided relation (probes, codebook, query subvectors) is
    //     a broadcast. Encode reuses v8's max_by hash aggregate;
    //     partial sums are the scaled integers that make ADC
    //     aggregation-order-free. ---
    "v14_ivfpq" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val subDim = 8
      val e = emb(s, dir)
      val ia = ivfAssign(s, dir)
      val assigned = ia.filter(col("rk") === 1).select(col("vec_id"), col("cell"))
      val probes = ia.filter(col("vec_id") < 5 && col("rk") <= 2)
        .select(col("vec_id").as("qid"), col("cell"))
      val cb = e.select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy(col("label"), col("pos")).agg(avg(col("v")).as("cv"))
        .groupBy(col("label"), (col("pos") / subDim).cast("int").as("sub"))
        .agg(expr("transform(array_sort(collect_list(struct(pos, cv))), x -> x.cv)").as("cent"))
        .select(col("sub"), col("label").cast("long").as("code"), col("cent"))
      // v8's fused map-only encode (one nested codebook broadcast row +
      // pq_encode in the scan projection — no n x nSub explode, no
      // encode shuffle); probe prune FIRST (corpus-keyed equi-join +
      // broadcast probes), then one pq_adc9 scalar per survivor replaces
      // the per-sub partial rows and their (qid, eid) aggregate
      val cbL = codebookLiteral(cb)
      // HOF cast kept deliberately — see v8's huge-span note (r20)
      val ev = e.select(col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("ev"))
      val coded = ev.filter(col("vec_id") >= 5)
        .select(col("vec_id"),
          graft.functions.pq_encode(col("ev"), cbL).as("codes"))
      val queriesQ = ev.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("ev").as("qv"))
      val wQ = Window.partitionBy(col("qid")).orderBy(col("adc9").desc, col("eid"))
      coded.join(assigned, Seq("vec_id"))
        .join(broadcast(probes), Seq("cell"))
        .filter(col("qid") =!= col("vec_id"))
        .join(broadcast(queriesQ), Seq("qid"))
        .select(col("qid"), col("vec_id").as("eid"),
          graft.functions.pq_adc9(col("qv"), col("codes"), cbL).as("adc9"))
        .withColumn("rk", row_number().over(wQ))
        .filter(col("rk") <= 3)
        .select(col("qid"), col("eid"), round(col("adc9") / 1e9, 6).as("adc"), col("rk"))
        .orderBy(col("qid"), col("rk"))
    }),

    // --- MMR diversified top-k (Carbonell-Goldstein '98): greedy
    //     re-ranking of a candidate pool, each pick maximizing
    //     0.7*relevance - 0.3*max-similarity-to-already-picked. The scale
    //     split is the point: candidate generation is v1's broadcast
    //     corpus scan (the only part that touches N), the greedy loop
    //     runs on a POOL-SIZED relation (20 rows, eager-checkpointed)
    //     whose pairwise-cosine table is computed once — at 100 TB the
    //     rerank cost is O(pool^2), independent of corpus size. All
    //     cosines round to 6 before any comparison, so the greedy
    //     argmax (ties to the lower id) is engine-independent. ---
    "v13_mmr" -> ((s, dir) => {
      val e = withNorm(emb(s, dir))
      val qv = e.filter(col("vec_id") === 0)
        .select(col("embedding").as("qe"), col("nrm").as("qn"))
      val pool = e.filter(col("vec_id") =!= 0).crossJoin(broadcast(qv))
        .select(col("vec_id").as("eid"), col("embedding").as("ee"), col("nrm").as("en"),
          round(graft.functions.vector_dot(col("embedding"), col("qe"))
            / (col("nrm") * col("qn")), 6).as("cq"))
        .orderBy(col("cq").desc, col("eid")).limit(20)
        .localCheckpoint(true)
      val pc = pool.as("a").join(pool.as("b"), col("a.eid") =!= col("b.eid"))
        .select(col("a.eid").as("e1"), col("b.eid").as("e2"),
          round(graft.functions.vector_dot(col("a.ee"), col("b.ee"))
            / (col("a.en") * col("b.en")), 6).as("c"))
        .localCheckpoint(true)
      var sel = pool
        .orderBy(col("cq").desc, col("eid")).limit(1)
        .select(col("eid"), lit(1).as("rk"), round(lit(0.7) * col("cq"), 6).as("score"))
        .localCheckpoint(true)
      for (k <- 2 to 5) {
        val selIds = sel.select(col("eid").as("se"))
        val pick = pool.join(sel.select(col("eid")), Seq("eid"), "left_anti")
          .join(pc.join(selIds, col("e2") === col("se")), col("eid") === col("e1"))
          .groupBy(col("eid"), col("cq"))
          .agg(max(col("c")).as("maxsim"))
          .select(col("eid"),
            round(lit(0.7) * col("cq") - lit(0.3) * col("maxsim"), 6).as("score"))
          .orderBy(col("score").desc, col("eid")).limit(1)
          .select(col("eid"), lit(k).as("rk"), col("score"))
        sel = sel.union(pick).localCheckpoint(true)
      }
      sel.select(col("rk"), col("eid"), col("score")).orderBy(col("rk"))
    }),

    // --- ANN quality harness: recall@3 of the IVF probe (v3) against
    //     the exact brute-force ground truth (v1) — the measurement every
    //     production ANN deployment runs before trusting an index, as a
    //     query rather than an offline notebook. Both sides reuse the
    //     family's own entries verbatim so the evaluation can never
    //     drift from what it claims to evaluate; the ground-truth side
    //     scores only the 5-query slice, so at 100 TB this costs one
    //     corpus pass (exact) + one cell probe — the standard recall-
    //     sample shape (sample queries, not the corpus). ---
    "v15_recall_eval" -> ((s, dir) => {
      val exact = queries("v1_cosine_topk")(s, dir)
        .select(col("qid"), col("eid"))
      val approx = queries("v3_ivf_topk")(s, dir)
        .select(col("qid").as("aq"), col("eid").as("ae"))
      exact.join(approx,
          col("qid") === col("aq") && col("eid") === col("ae"), "left")
        .groupBy(col("qid"))
        .agg(count(lit(1)).as("k"),
          sum(when(col("aq").isNotNull, 1L).otherwise(0L)).as("n_hit"))
        .select(col("qid"), col("k"), col("n_hit"),
          round(col("n_hit") / col("k"), 4).as("recall"))
        .orderBy(col("qid"))
    }),

    // --- the probe-count tuning curve: recall@3 at probes = 1, 2, 3 in
    //     ONE query — the accuracy-vs-cost sweep that picks an IVF
    //     deployment's nprobe (v15 measures one point; this measures the
    //     curve). The candidate set is scored ONCE for the widest probe
    //     and each level re-ranks the prefix (prk <= p) — no per-level
    //     corpus pass; candidates explode 3x through a row-local
    //     sequence, the window runs over (p, qid) groups. Ground truth
    //     reuses v1 verbatim (v15's can't-drift rule). ---
    "v17_probe_sweep" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val e = emb(s, dir)
      // r15: both the corpus rk=1 assignment and the query rk<=3 probes
      // read the shared ivfAssign artifact (built once from rankedCells
      // — identical rows to the max-struct argmax this query previously
      // ran, per the r11 A/B); vector columns rejoin by vec_id
      val ia = ivfAssign(s, dir)
      val en = withNorm(e)
      val a = ia.filter(col("rk") === 1).join(en, Seq("vec_id"))
        .select(col("cell"), col("vec_id").as("eid"),
          col("embedding").as("ee"), col("nrm").as("en"))
      val qp = ia.filter(col("vec_id") < 5 && col("rk") <= 3).join(en, Seq("vec_id"))
        .select(col("cell"), col("vec_id").as("qid"),
          col("embedding").as("qe"), col("nrm").as("qn"), col("rk").as("prk"))
      val cand = broadcast(qp).join(a, Seq("cell"))
        .filter(col("eid") =!= col("qid"))
        .select(col("qid"), col("eid"), col("prk"),
          (dot("qe", "ee") / (col("qn") * col("en"))).as("cos_raw"))
      val wP = Window.partitionBy(col("p"), col("qid"))
        .orderBy(round(col("cos_raw"), 6).desc, col("eid"))
      val ap = cand.withColumn("p", explode(expr("sequence(1, 3)")))
        .filter(col("prk") <= col("p"))
        .withColumn("rk", row_number().over(wP))
        .filter(col("rk") <= 3)
        .select(col("p"), col("qid"), col("eid"))
      val exact = queries("v1_cosine_topk")(s, dir)
        .select(col("qid"), col("eid"))
        .localCheckpoint(true) // consumed by the hit join AND the count
      // the checkpoint leaf is stats-less, so without the hint this
      // 15-row side plans as a full SortMergeJoin (sort + exchange on
      // both sides) — the checkpoint-leaf-broadcast idiom from g1/g4
      val hits = ap.join(broadcast(exact), Seq("qid", "eid"), "left_semi")
        .groupBy(col("p")).agg(count(lit(1)).as("n_hit"))
      hits.crossJoin(broadcast(exact.agg(count(lit(1)).as("n_exact"))))
        .select(col("p"), col("n_exact"), col("n_hit"),
          round(col("n_hit") / col("n_exact"), 4).as("recall"))
        .orderBy(col("p"))
    }),

    // --- approximate kNN GRAPH (every vector's top-3 neighbors, not just
    //     5 probe queries): the corpus-curation primitive behind SemDeDup
    //     clustering, kNN-classifier labeling, and graph-based diversity
    //     sampling. Exact all-pairs is O(n^2); restricting neighbors to
    //     each vector's own IVF cell makes the pair scan a SELF-EQUI-JOIN
    //     ON THE CELL ID — shuffle-hash over cell-bounded groups. The
    //     cell count is NOT fixed: K = ceil(n/64) md5-rank exemplars
    //     (knnGraphOf), so occupancy is ~constant and pair work is
    //     O(n x 64) BY CONSTRUCTION — the round-9 rehearsal measured the
    //     fixed-K alternative at 31.7x wall for 8x data; the round-10
    //     rehearsal runs the gated auto-K plan itself at 2.06x (contrast
    //     arm with frozen K: 6.0x). Both pair-scan sides shuffle once by
    //     cell; only the K-row exemplar codebook broadcasts — the
    //     deliberate contrast with v3's broadcast-queries probe. Per-
    //     vector top-3 is a window over cell-bounded groups. ---
    // (the pair scan lives in `knnGraphOf`, shared with the rehearsal;
    // eager checkpoint before the self-join — without it the argmax
    // assignment re-executes once per join side, g3's edge-list
    // precedent. Exemplar-cell occupancy skew is gated by IvfSkewSpec
    // via `knnCellHistogram`.)
    "v16_knn_graph" -> ((s, dir) => knnGraphOf(emb(s, dir)))
  )

  /** v15: v1's exact CTEs and v3's IVF CTEs verbatim (renamed apart),
    * joined into per-query recall. */
  private val recallEvalSql =
    """WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5),
      |exs AS (
      |  SELECT q.qid, e.vec_id AS eid,
      |    list_dot_product(CAST(q.qe AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) /
      |      (sqrt(list_dot_product(CAST(q.qe AS DOUBLE[]), CAST(q.qe AS DOUBLE[]))) *
      |       sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))) AS cos_raw
      |  FROM q, embeddings e WHERE e.vec_id != q.qid),
      |ex AS (
      |  SELECT qid, eid FROM (
      |    SELECT qid, eid,
      |      row_number() OVER (PARTITION BY qid ORDER BY round(cos_raw, 6) DESC, eid) AS rk
      |    FROM exs) WHERE rk <= 3),
      |dims AS (
      |  SELECT label, i AS pos, avg(CAST(embedding[i + 1] AS DOUBLE)) AS cv
      |  FROM embeddings, LATERAL (SELECT unnest(generate_series(0, 63)) AS i) u
      |  GROUP BY label, i),
      |cent AS (
      |  SELECT label AS cell, list(cv ORDER BY pos) AS centroid FROM dims GROUP BY label),
      |cs AS (
      |  SELECT e.vec_id, e.embedding, c.cell,
      |    list_dot_product(CAST(e.embedding AS DOUBLE[]), c.centroid) /
      |      (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))) *
      |       sqrt(list_dot_product(c.centroid, c.centroid))) AS cos_raw
      |  FROM embeddings e, cent c),
      |assigned AS (
      |  SELECT vec_id, embedding, cell FROM (
      |    SELECT vec_id, embedding, cell,
      |      row_number() OVER (PARTITION BY vec_id ORDER BY round(cos_raw, 6) DESC, cell) AS rk
      |    FROM cs) WHERE rk = 1),
      |probe AS (
      |  SELECT qv.vec_id AS qid, e.vec_id AS eid,
      |    list_dot_product(CAST(qv.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) /
      |      (sqrt(list_dot_product(CAST(qv.embedding AS DOUBLE[]), CAST(qv.embedding AS DOUBLE[]))) *
      |       sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))) AS cos_raw
      |  FROM assigned qv JOIN assigned e ON qv.cell = e.cell AND qv.vec_id != e.vec_id
      |  WHERE qv.vec_id < 5),
      |ap AS (
      |  SELECT qid, eid FROM (
      |    SELECT qid, eid,
      |      row_number() OVER (PARTITION BY qid ORDER BY round(cos_raw, 6) DESC, eid) AS rk
      |    FROM probe) WHERE rk <= 3)
      |SELECT ex.qid, count(*) AS k,
      |  CAST(sum(CASE WHEN ap.eid IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
      |  round(CAST(sum(CASE WHEN ap.eid IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
      |    / count(*), 4) AS recall
      |FROM ex LEFT JOIN ap ON ex.qid = ap.qid AND ex.eid = ap.eid
      |GROUP BY ex.qid ORDER BY ex.qid""".stripMargin

  private val dotSql =
    "list_dot_product(CAST(%s AS DOUBLE[]), CAST(%s AS DOUBLE[]))"

  /** MMR oracle round k: score the not-yet-picked pool against the
    * union of earlier picks, take the (score, eid)-max. */
  private def mmrIter(k: Int): String = {
    val selU = (1 until k).map(i => s"SELECT eid FROM s$i").mkString(" UNION ALL ")
    s"""r$k AS (
       |  SELECT p.eid, p.cq, max(pc.c) AS maxsim
       |  FROM pool p JOIN pc ON p.eid = pc.e1
       |  WHERE pc.e2 IN ($selU) AND p.eid NOT IN ($selU)
       |  GROUP BY p.eid, p.cq),
       |s$k AS (SELECT eid, $k AS rk, round(0.7 * cq - 0.3 * maxsim, 6) AS score
       |        FROM r$k ORDER BY score DESC, eid LIMIT 1)""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "v15_recall_eval" -> recallEvalSql,

    // v15's exact + assignment CTEs with the probe generalized to
    // rk <= 3 query cells; each level p re-ranks the prk <= p prefix
    "v17_probe_sweep" ->
      """WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5),
        |exs AS (
        |  SELECT q.qid, e.vec_id AS eid,
        |    list_dot_product(CAST(q.qe AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) /
        |      (sqrt(list_dot_product(CAST(q.qe AS DOUBLE[]), CAST(q.qe AS DOUBLE[]))) *
        |       sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))) AS cos_raw
        |  FROM q, embeddings e WHERE e.vec_id != q.qid),
        |ex AS (
        |  SELECT qid, eid FROM (
        |    SELECT qid, eid,
        |      row_number() OVER (PARTITION BY qid ORDER BY round(cos_raw, 6) DESC, eid) AS rk
        |    FROM exs) WHERE rk <= 3),
        |dims AS (
        |  SELECT label, i AS pos, avg(CAST(embedding[i + 1] AS DOUBLE)) AS cv
        |  FROM embeddings, LATERAL (SELECT unnest(generate_series(0, 63)) AS i) u
        |  GROUP BY label, i),
        |cent AS (
        |  SELECT label AS cell, list(cv ORDER BY pos) AS centroid FROM dims GROUP BY label),
        |cs AS (
        |  SELECT e.vec_id, e.embedding, c.cell,
        |    list_dot_product(CAST(e.embedding AS DOUBLE[]), c.centroid) /
        |      (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))) *
        |       sqrt(list_dot_product(c.centroid, c.centroid))) AS cos_raw
        |  FROM embeddings e, cent c),
        |ranked AS (
        |  SELECT vec_id, embedding, cell,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY round(cos_raw, 6) DESC, cell) AS rk
        |  FROM cs),
        |assigned AS (SELECT vec_id, embedding, cell FROM ranked WHERE rk = 1),
        |qp AS (SELECT vec_id AS qid, embedding AS qe, cell, rk AS prk
        |       FROM ranked WHERE rk <= 3 AND vec_id < 5),
        |cand AS (
        |  SELECT qp.qid, e.vec_id AS eid, qp.prk,
        |    list_dot_product(CAST(qp.qe AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) /
        |      (sqrt(list_dot_product(CAST(qp.qe AS DOUBLE[]), CAST(qp.qe AS DOUBLE[]))) *
        |       sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))) AS cos_raw
        |  FROM qp JOIN assigned e ON qp.cell = e.cell AND e.vec_id != qp.qid),
        |lv AS (SELECT CAST(unnest(generate_series(1, 3)) AS INT) AS p),
        |rp AS (
        |  SELECT lv.p, cand.qid, cand.eid,
        |    row_number() OVER (PARTITION BY lv.p, cand.qid
        |                       ORDER BY round(cand.cos_raw, 6) DESC, cand.eid) AS rk
        |  FROM cand, lv WHERE cand.prk <= lv.p),
        |ap AS (SELECT p, qid, eid FROM rp WHERE rk <= 3),
        |hits AS (SELECT ap.p, count(*) AS n_hit
        |         FROM ap JOIN ex ON ap.qid = ex.qid AND ap.eid = ex.eid
        |         GROUP BY ap.p)
        |SELECT p, (SELECT count(*) FROM ex) AS n_exact, n_hit,
        |  round(n_hit * 1.0 / (SELECT count(*) FROM ex), 4) AS recall
        |FROM hits ORDER BY p""".stripMargin,

    // v3's assignment CTEs, with the probe generalized from the 5-query
    // slice to the whole corpus (self-join on the cell)
    "v16_knn_graph" ->
      """WITH ex AS (
        |  SELECT vec_id AS cell, CAST(embedding AS DOUBLE[]) AS ce
        |  FROM embeddings
        |  ORDER BY md5(CAST(vec_id AS VARCHAR))
        |  LIMIT (SELECT CAST(ceil(count(*) / 64.0) AS BIGINT) FROM embeddings)),
        |scored AS (
        |  SELECT e.vec_id, e.embedding, x.cell,
        |    list_dot_product(CAST(e.embedding AS DOUBLE[]), x.ce) /
        |      (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))) *
        |       sqrt(list_dot_product(x.ce, x.ce))) AS cos_raw
        |  FROM embeddings e, ex x),
        |assigned AS (
        |  SELECT vec_id, embedding, cell FROM (
        |    SELECT vec_id, embedding, cell,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY round(cos_raw, 6) DESC, cell) AS rk
        |    FROM scored) WHERE rk = 1),
        |pairs AS (
        |  SELECT a.vec_id, b.vec_id AS nid,
        |    list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) /
        |      (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[]))) *
        |       sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))) AS cos_raw
        |  FROM assigned a JOIN assigned b ON a.cell = b.cell AND a.vec_id != b.vec_id),
        |ranked AS (
        |  SELECT vec_id, nid, round(cos_raw, 6) AS cos,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY round(cos_raw, 6) DESC, nid) AS rk
        |  FROM pairs)
        |SELECT vec_id, rk, nid, cos FROM ranked WHERE rk <= 3
        |ORDER BY vec_id, rk""".stripMargin,

    "v13_mmr" ->
      s"""WITH n AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         |    sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
         |                          CAST(embedding AS DOUBLE[]))) AS nrm
         |  FROM embeddings),
         |q AS (SELECT v AS qe, nrm AS qn FROM n WHERE vec_id = 0),
         |pool AS (
         |  SELECT vec_id AS eid, v, nrm,
         |    round(list_dot_product(v, qe) / (nrm * qn), 6) AS cq
         |  FROM n, q WHERE vec_id != 0
         |  ORDER BY cq DESC, eid LIMIT 20),
         |pc AS (
         |  SELECT a.eid AS e1, b.eid AS e2,
         |    round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) AS c
         |  FROM pool a JOIN pool b ON a.eid != b.eid),
         |s1 AS (SELECT eid, 1 AS rk, round(0.7 * cq, 6) AS score
         |       FROM pool ORDER BY cq DESC, eid LIMIT 1),
         |${mmrIter(2)},
         |${mmrIter(3)},
         |${mmrIter(4)},
         |${mmrIter(5)}
         |SELECT rk, eid, score FROM (
         |  SELECT * FROM s1 UNION ALL SELECT * FROM s2 UNION ALL
         |  SELECT * FROM s3 UNION ALL SELECT * FROM s4 UNION ALL
         |  SELECT * FROM s5)
         |ORDER BY rk""".stripMargin,

    "v11_semdedup" ->
      """WITH n AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |    sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
        |                          CAST(embedding AS DOUBLE[]))) AS nrm
        |  FROM embeddings),
        |c AS (SELECT vec_id AS cell, v AS ce, nrm AS cn FROM n
        |      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 32),
        |ass AS (
        |  SELECT vec_id, cell, v, nrm,
        |    row_number() OVER (PARTITION BY vec_id
        |      ORDER BY round(list_dot_product(v, ce)/(nrm*cn), 6) DESC, cell) AS rk
        |  FROM n CROSS JOIN c),
        |a1 AS (SELECT vec_id, v, nrm, cell FROM ass WHERE rk = 1),
        |drp AS (
        |  SELECT DISTINCT b.cell, b.vec_id
        |  FROM a1 a JOIN a1 b ON a.cell = b.cell AND a.vec_id < b.vec_id
        |  WHERE round(list_dot_product(a.v, b.v)/(a.nrm*b.nrm), 6) >= 0.35)
        |SELECT a1.cell, count(*) AS n_members,
        |  CAST(sum(CASE WHEN drp.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_dropped
        |FROM a1 LEFT JOIN drp
        |  ON a1.cell = drp.cell AND a1.vec_id = drp.vec_id
        |GROUP BY a1.cell ORDER BY a1.cell""".stripMargin,

    "v12_filtered_topk" ->
      """WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5),
        |f AS (SELECT vec_id, embedding FROM embeddings WHERE label = 3),
        |scored AS (
        |  SELECT q.qid, e.vec_id AS eid,
        |    list_dot_product(CAST(q.qe AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) /
        |      (sqrt(list_dot_product(CAST(q.qe AS DOUBLE[]), CAST(q.qe AS DOUBLE[]))) *
        |       sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))) AS cos_raw
        |  FROM q, f e WHERE e.vec_id != q.qid),
        |ranked AS (
        |  SELECT qid, eid, round(cos_raw, 6) AS cos,
        |    row_number() OVER (PARTITION BY qid ORDER BY round(cos_raw, 6) DESC, eid) AS rk
        |  FROM scored)
        |SELECT qid, eid, cos, rk FROM ranked WHERE rk <= 3
        |ORDER BY qid, rk""".stripMargin,

    "v1_cosine_topk" ->
      """WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5),
        |scored AS (
        |  SELECT q.qid, e.vec_id AS eid,
        |    list_dot_product(CAST(q.qe AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) /
        |      (sqrt(list_dot_product(CAST(q.qe AS DOUBLE[]), CAST(q.qe AS DOUBLE[]))) *
        |       sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))) AS cos_raw
        |  FROM q, embeddings e WHERE e.vec_id != q.qid),
        |ranked AS (
        |  SELECT qid, eid, round(cos_raw, 6) AS cos,
        |    row_number() OVER (PARTITION BY qid ORDER BY round(cos_raw, 6) DESC, eid) AS rk
        |  FROM scored)
        |SELECT qid, eid, cos, rk FROM ranked WHERE rk <= 3
        |ORDER BY qid, rk""".stripMargin,

    "v18_range_search" ->
      """WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 8),
        |scored AS (
        |  SELECT q.qid,
        |    round(list_dot_product(CAST(q.qe AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) /
        |      (sqrt(list_dot_product(CAST(q.qe AS DOUBLE[]), CAST(q.qe AS DOUBLE[]))) *
        |       sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))), 6) AS cos
        |  FROM q, embeddings e WHERE e.vec_id != q.qid)
        |SELECT qid, CAST(count(*) AS BIGINT) AS n_in_range,
        |  round(CAST(sum(CAST(round(cos * 1e6) AS BIGINT)) AS BIGINT) / count(*) / 1e6, 6) AS avg_cos,
        |  round(max(cos), 6) AS max_cos
        |FROM scored WHERE cos >= 0.2
        |GROUP BY qid ORDER BY qid""".stripMargin,

    "v2_ivf_assign" ->
      """WITH dims AS (
        |  SELECT label, i AS pos, avg(CAST(embedding[i + 1] AS DOUBLE)) AS cv
        |  FROM embeddings, LATERAL (SELECT unnest(generate_series(0, 63)) AS i) u
        |  GROUP BY label, i),
        |cent AS (
        |  SELECT label AS cell, list(cv ORDER BY pos) AS centroid FROM dims GROUP BY label),
        |scored AS (
        |  SELECT e.vec_id, e.label, c.cell,
        |    list_dot_product(CAST(e.embedding AS DOUBLE[]), c.centroid) /
        |      (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))) *
        |       sqrt(list_dot_product(c.centroid, c.centroid))) AS cos_raw
        |  FROM embeddings e, cent c),
        |ranked AS (
        |  SELECT vec_id, label, cell,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY round(cos_raw, 6) DESC, cell) AS rk
        |  FROM scored)
        |SELECT label, cell, count(*) AS n FROM ranked WHERE rk = 1
        |GROUP BY label, cell ORDER BY label, cell""".stripMargin,

    "v4_embedding_neardup" ->
      """WITH pairs AS (
        |  SELECT a.vec_id AS id1, b.vec_id AS id2,
        |    list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) /
        |      (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[]))) *
        |       sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))) AS cos_raw
        |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
        |SELECT id1, id2, round(cos_raw, 6) AS cos
        |FROM pairs WHERE round(cos_raw, 6) >= 0.45
        |ORDER BY id1, id2""".stripMargin,

    "v5_rhp_lsh" ->
      """WITH planes AS (
        |  SELECT b, i,
        |    (('0x' || substr(md5(CAST(b AS VARCHAR) || '_' || CAST(i AS VARCHAR)), 1, 8))::BIGINT
        |       / 2147483648.0) - 1.0 AS w
        |  FROM (SELECT unnest(generate_series(0, 15)) AS b) pb,
        |       (SELECT unnest(generate_series(0, 63)) AS i) pi),
        |bits AS (
        |  SELECT e.vec_id, p.b,
        |    CASE WHEN round(sum(e.embedding[p.i + 1] * p.w), 6) >= 0 THEN 1 ELSE 0 END AS bit
        |  FROM embeddings e, planes p
        |  GROUP BY e.vec_id, p.b),
        |bands AS (
        |  SELECT vec_id, b // 4 AS band,
        |    CAST(sum(bit * (1 << (b % 4))) AS BIGINT) AS bkey
        |  FROM bits GROUP BY vec_id, b // 4),
        |cand AS (
        |  SELECT DISTINCT a.vec_id AS id1, c.vec_id AS id2
        |  FROM bands a JOIN bands c ON a.band = c.band AND a.bkey = c.bkey AND a.vec_id < c.vec_id),
        |conf AS (
        |  SELECT id1, id2,
        |    list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) /
        |      (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[]))) *
        |       sqrt(list_dot_product(CAST(c.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])))) AS cos_raw
        |  FROM cand JOIN embeddings a ON cand.id1 = a.vec_id
        |            JOIN embeddings c ON cand.id2 = c.vec_id)
        |SELECT id1, id2, round(cos_raw, 6) AS cos FROM conf
        |WHERE round(cos_raw, 6) >= 0.45 ORDER BY id1, id2""".stripMargin,

    "v9_pq_rot" ->
      """WITH pm AS (
        |  SELECT i, md5('rot' || CAST(i AS VARCHAR)) AS h,
        |    CASE WHEN substr(md5('rot' || CAST(i AS VARCHAR)), 2, 1)
        |              IN ('0','1','2','3','4','5','6','7')
        |         THEN 1.0 ELSE -1.0 END AS sg
        |  FROM (SELECT unnest(generate_series(0, 63)) AS i)),
        |ord AS (SELECT i, sg, row_number() OVER (ORDER BY h, i) - 1 AS j FROM pm),
        |rot AS (
        |  SELECT e.vec_id, e.label,
        |    list(o.sg * CAST(e.embedding[o.i + 1] AS DOUBLE) ORDER BY o.j) AS embedding
        |  FROM embeddings e, ord o GROUP BY e.vec_id, e.label),
        |cbdim AS (
        |  SELECT label, i AS pos, avg(embedding[i + 1]) AS cv
        |  FROM rot, LATERAL (SELECT unnest(generate_series(0, 63)) AS i) u
        |  GROUP BY label, i),
        |cb AS (
        |  SELECT label AS code, pos // 8 AS sub, list(cv ORDER BY pos) AS cent
        |  FROM cbdim GROUP BY label, pos // 8),
        |subs AS (
        |  SELECT e.vec_id, s.sub,
        |    e.embedding[s.sub * 8 + 1 : s.sub * 8 + 8] AS sv
        |  FROM rot e, (SELECT unnest(generate_series(0, 7)) AS sub) s),
        |enc AS (
        |  SELECT vec_id, sub, code FROM (
        |    SELECT subs.vec_id, subs.sub, cb.code,
        |      row_number() OVER (PARTITION BY subs.vec_id, subs.sub
        |        ORDER BY round(list_dot_product(sv, cent) * 2
        |                       - list_dot_product(cent, cent), 6) DESC, cb.code) AS rk
        |    FROM subs JOIN cb ON subs.sub = cb.sub) WHERE rk = 1),
        |partials AS (
        |  SELECT q.vec_id AS qid, enc.vec_id AS eid,
        |    CAST(round(list_dot_product(q.sv, cb.cent) * 1e9) AS BIGINT) AS p9
        |  FROM enc JOIN cb ON enc.sub = cb.sub AND enc.code = cb.code
        |           JOIN subs q ON q.sub = enc.sub AND q.vec_id < 5
        |  WHERE enc.vec_id >= 5),
        |adc AS (SELECT qid, eid, CAST(sum(p9) AS BIGINT) AS adc9
        |        FROM partials GROUP BY qid, eid),
        |ranked AS (
        |  SELECT qid, eid, adc9,
        |    row_number() OVER (PARTITION BY qid ORDER BY adc9 DESC, eid) AS rk
        |  FROM adc)
        |SELECT qid, eid, round(adc9 / 1e9, 6) AS adc, rk
        |FROM ranked WHERE rk <= 3 ORDER BY qid, rk""".stripMargin,

    "v8_pq_adc" ->
      """WITH cbdim AS (
        |  SELECT label, i AS pos, avg(CAST(embedding[i + 1] AS DOUBLE)) AS cv
        |  FROM embeddings, LATERAL (SELECT unnest(generate_series(0, 63)) AS i) u
        |  GROUP BY label, i),
        |cb AS (
        |  SELECT label AS code, pos // 8 AS sub, list(cv ORDER BY pos) AS cent
        |  FROM cbdim GROUP BY label, pos // 8),
        |subs AS (
        |  SELECT e.vec_id, s.sub,
        |    list_transform(e.embedding[s.sub * 8 + 1 : s.sub * 8 + 8],
        |                   x -> CAST(x AS DOUBLE)) AS sv
        |  FROM embeddings e, (SELECT unnest(generate_series(0, 7)) AS sub) s),
        |enc AS (
        |  SELECT vec_id, sub, code FROM (
        |    SELECT subs.vec_id, subs.sub, cb.code,
        |      row_number() OVER (PARTITION BY subs.vec_id, subs.sub
        |        ORDER BY round(list_dot_product(sv, cent) * 2
        |                       - list_dot_product(cent, cent), 6) DESC, cb.code) AS rk
        |    FROM subs JOIN cb ON subs.sub = cb.sub) WHERE rk = 1),
        |partials AS (
        |  SELECT q.vec_id AS qid, enc.vec_id AS eid,
        |    CAST(round(list_dot_product(q.sv, cb.cent) * 1e9) AS BIGINT) AS p9
        |  FROM enc JOIN cb ON enc.sub = cb.sub AND enc.code = cb.code
        |           JOIN subs q ON q.sub = enc.sub AND q.vec_id < 5
        |  WHERE enc.vec_id >= 5),
        |adc AS (SELECT qid, eid, CAST(sum(p9) AS BIGINT) AS adc9
        |        FROM partials GROUP BY qid, eid),
        |ranked AS (
        |  SELECT qid, eid, adc9,
        |    row_number() OVER (PARTITION BY qid ORDER BY adc9 DESC, eid) AS rk
        |  FROM adc)
        |SELECT qid, eid, round(adc9 / 1e9, 6) AS adc, rk
        |FROM ranked WHERE rk <= 3 ORDER BY qid, rk""".stripMargin,

    // partials carries a redundant `q.vec_id < 5` single-table filter
    // (implied by q.vec_id = p.qid since probes are qid < 5): without
    // it, DuckDB's sf1 join order starts from `q.sub = enc.sub` — 8
    // distinct values, an n^2/8-per-sub blowup measured at >230 GB of
    // spill at 10x data (the Spark plan broadcast-joins the 5 probes
    // first, so only the oracle needed the hint). Values unchanged.
    "v14_ivfpq" ->
      """WITH dims AS (
        |  SELECT label, i AS pos, avg(CAST(embedding[i + 1] AS DOUBLE)) AS cv
        |  FROM embeddings, LATERAL (SELECT unnest(generate_series(0, 63)) AS i) u
        |  GROUP BY label, i),
        |cent AS (
        |  SELECT label AS cell, list(cv ORDER BY pos) AS centroid FROM dims GROUP BY label),
        |scored AS (
        |  SELECT e.vec_id, c.cell,
        |    list_dot_product(CAST(e.embedding AS DOUBLE[]), c.centroid) /
        |      (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))) *
        |       sqrt(list_dot_product(c.centroid, c.centroid))) AS cos_raw
        |  FROM embeddings e, cent c),
        |rankedc AS (
        |  SELECT vec_id, cell,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY round(cos_raw, 6) DESC, cell) AS rk
        |  FROM scored),
        |assigned AS (SELECT vec_id, cell FROM rankedc WHERE rk = 1),
        |probes AS (SELECT vec_id AS qid, cell FROM rankedc WHERE vec_id < 5 AND rk <= 2),
        |cb AS (
        |  SELECT label AS code, pos // 8 AS sub, list(cv ORDER BY pos) AS cent
        |  FROM dims GROUP BY label, pos // 8),
        |subs AS (
        |  SELECT e.vec_id, s.sub,
        |    list_transform(e.embedding[s.sub * 8 + 1 : s.sub * 8 + 8],
        |                   x -> CAST(x AS DOUBLE)) AS sv
        |  FROM embeddings e, (SELECT unnest(generate_series(0, 7)) AS sub) s),
        |enc AS (
        |  SELECT vec_id, sub, code FROM (
        |    SELECT subs.vec_id, subs.sub, cb.code,
        |      row_number() OVER (PARTITION BY subs.vec_id, subs.sub
        |        ORDER BY round(list_dot_product(sv, cent) * 2
        |                       - list_dot_product(cent, cent), 6) DESC, cb.code) AS rk
        |    FROM subs JOIN cb ON subs.sub = cb.sub) WHERE rk = 1),
        |partials AS (
        |  SELECT p.qid, enc.vec_id AS eid,
        |    CAST(round(list_dot_product(q.sv, cb.cent) * 1e9) AS BIGINT) AS p9
        |  FROM enc
        |       JOIN assigned a ON enc.vec_id = a.vec_id
        |       JOIN probes p ON a.cell = p.cell AND p.qid != enc.vec_id
        |       JOIN cb ON enc.sub = cb.sub AND enc.code = cb.code
        |       JOIN subs q ON q.sub = enc.sub AND q.vec_id = p.qid
        |                  AND q.vec_id < 5
        |  WHERE enc.vec_id >= 5),
        |adc AS (SELECT qid, eid, CAST(sum(p9) AS BIGINT) AS adc9
        |        FROM partials GROUP BY qid, eid),
        |rankedq AS (
        |  SELECT qid, eid, adc9,
        |    row_number() OVER (PARTITION BY qid ORDER BY adc9 DESC, eid) AS rk
        |  FROM adc)
        |SELECT qid, eid, round(adc9 / 1e9, 6) AS adc, rk
        |FROM rankedq WHERE rk <= 3 ORDER BY qid, rk""".stripMargin,

    "v7_sq8_rerank" ->
      """WITH b AS (
        |  SELECT i AS pos,
        |    min(CAST(embedding[i + 1] AS DOUBLE)) AS lo,
        |    max(CAST(embedding[i + 1] AS DOUBLE)) AS hi
        |  FROM embeddings, LATERAL (SELECT unnest(generate_series(0, 63)) AS i) u
        |  GROUP BY i),
        |q AS (
        |  SELECT e.vec_id, e.embedding,
        |    list(CASE WHEN b.hi = b.lo THEN CAST(0 AS DOUBLE)
        |         ELSE CAST(floor((CAST(e.embedding[b.pos + 1] AS DOUBLE) - b.lo) * 255.0
        |                    / (b.hi - b.lo) + 0.5) AS DOUBLE) END ORDER BY b.pos) AS qv
        |  FROM embeddings e, b GROUP BY e.vec_id, e.embedding),
        |cand AS (
        |  SELECT qs.vec_id AS qid, qs.embedding AS qe, es.vec_id AS eid,
        |    es.embedding AS ee,
        |    CAST(list_dot_product(qs.qv, es.qv) AS BIGINT) AS iscore
        |  FROM q qs JOIN q es ON qs.vec_id < 5 AND es.vec_id != qs.vec_id),
        |top AS (
        |  SELECT qid, qe, eid, ee,
        |    row_number() OVER (PARTITION BY qid ORDER BY iscore DESC, eid) AS irk
        |  FROM cand),
        |rer AS (
        |  SELECT qid, eid,
        |    list_dot_product(CAST(qe AS DOUBLE[]), CAST(ee AS DOUBLE[])) /
        |      (sqrt(list_dot_product(CAST(qe AS DOUBLE[]), CAST(qe AS DOUBLE[]))) *
        |       sqrt(list_dot_product(CAST(ee AS DOUBLE[]), CAST(ee AS DOUBLE[])))) AS cos_raw
        |  FROM top WHERE irk <= 10),
        |ranked AS (
        |  SELECT qid, eid, round(cos_raw, 6) AS cos,
        |    row_number() OVER (PARTITION BY qid ORDER BY round(cos_raw, 6) DESC, eid) AS rk
        |  FROM rer)
        |SELECT qid, eid, cos, rk FROM ranked WHERE rk <= 3
        |ORDER BY qid, rk""".stripMargin,

    "v10_bq_hamming" ->
      """WITH mu AS (
        |  SELECT i AS pos, avg(CAST(embedding[i + 1] AS DOUBLE)) AS m
        |  FROM embeddings, LATERAL (SELECT unnest(generate_series(0, 63)) AS i) u
        |  GROUP BY i),
        |codes AS (
        |  SELECT e.vec_id, e.embedding,
        |    CAST(sum(CASE WHEN mu.pos < 32 AND CAST(e.embedding[mu.pos + 1] AS DOUBLE) > mu.m
        |             THEN (CAST(1 AS BIGINT) << mu.pos) ELSE 0 END) AS BIGINT) AS code_lo,
        |    CAST(sum(CASE WHEN mu.pos >= 32 AND CAST(e.embedding[mu.pos + 1] AS DOUBLE) > mu.m
        |             THEN (CAST(1 AS BIGINT) << (mu.pos - 32)) ELSE 0 END) AS BIGINT) AS code_hi
        |  FROM embeddings e, mu GROUP BY e.vec_id, e.embedding),
        |cand AS (
        |  SELECT q.vec_id AS qid, q.embedding AS qe, c.vec_id AS eid, c.embedding AS ee,
        |    CAST(bit_count(xor(q.code_lo, c.code_lo)) AS BIGINT) +
        |    CAST(bit_count(xor(q.code_hi, c.code_hi)) AS BIGINT) AS ham
        |  FROM codes q JOIN codes c ON q.vec_id < 5 AND c.vec_id != q.vec_id),
        |top AS (
        |  SELECT qid, qe, eid, ee, ham,
        |    row_number() OVER (PARTITION BY qid ORDER BY ham, eid) AS hrk
        |  FROM cand),
        |rer AS (
        |  SELECT qid, eid, ham,
        |    list_dot_product(CAST(qe AS DOUBLE[]), CAST(ee AS DOUBLE[])) /
        |      (sqrt(list_dot_product(CAST(qe AS DOUBLE[]), CAST(qe AS DOUBLE[]))) *
        |       sqrt(list_dot_product(CAST(ee AS DOUBLE[]), CAST(ee AS DOUBLE[])))) AS cos_raw
        |  FROM top WHERE hrk <= 10),
        |ranked AS (
        |  SELECT qid, eid, ham, round(cos_raw, 6) AS cos,
        |    row_number() OVER (PARTITION BY qid ORDER BY round(cos_raw, 6) DESC, eid) AS rk
        |  FROM rer)
        |SELECT qid, eid, ham, cos, rk FROM ranked WHERE rk <= 3
        |ORDER BY qid, rk""".stripMargin,

    "v6_ivf_multiprobe" ->
      """WITH dims AS (
        |  SELECT label, i AS pos, avg(CAST(embedding[i + 1] AS DOUBLE)) AS cv
        |  FROM embeddings, LATERAL (SELECT unnest(generate_series(0, 63)) AS i) u
        |  GROUP BY label, i),
        |cent AS (
        |  SELECT label AS cell, list(cv ORDER BY pos) AS centroid FROM dims GROUP BY label),
        |scored AS (
        |  SELECT e.vec_id, e.embedding, c.cell,
        |    list_dot_product(CAST(e.embedding AS DOUBLE[]), c.centroid) /
        |      (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))) *
        |       sqrt(list_dot_product(c.centroid, c.centroid))) AS cos_raw
        |  FROM embeddings e, cent c),
        |ranked AS (
        |  SELECT vec_id, embedding, cell,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY round(cos_raw, 6) DESC, cell) AS rk
        |  FROM scored),
        |assigned AS (
        |  SELECT vec_id, embedding, cell FROM ranked WHERE rk = 1),
        |probes AS (
        |  SELECT vec_id AS qid, embedding AS qe, cell FROM ranked
        |  WHERE vec_id < 5 AND rk <= 2),
        |probe AS (
        |  SELECT q.qid, e.vec_id AS eid,
        |    list_dot_product(CAST(q.qe AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) /
        |      (sqrt(list_dot_product(CAST(q.qe AS DOUBLE[]), CAST(q.qe AS DOUBLE[]))) *
        |       sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))) AS cos_raw
        |  FROM probes q JOIN assigned e ON q.cell = e.cell AND q.qid != e.vec_id),
        |rankedq AS (
        |  SELECT qid, eid, round(cos_raw, 6) AS cos,
        |    row_number() OVER (PARTITION BY qid ORDER BY round(cos_raw, 6) DESC, eid) AS rk
        |  FROM probe)
        |SELECT qid, eid, cos, rk FROM rankedq WHERE rk <= 3
        |ORDER BY qid, rk""".stripMargin,

    "v3_ivf_topk" ->
      """WITH dims AS (
        |  SELECT label, i AS pos, avg(CAST(embedding[i + 1] AS DOUBLE)) AS cv
        |  FROM embeddings, LATERAL (SELECT unnest(generate_series(0, 63)) AS i) u
        |  GROUP BY label, i),
        |cent AS (
        |  SELECT label AS cell, list(cv ORDER BY pos) AS centroid FROM dims GROUP BY label),
        |scored AS (
        |  SELECT e.vec_id, e.embedding, c.cell,
        |    list_dot_product(CAST(e.embedding AS DOUBLE[]), c.centroid) /
        |      (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))) *
        |       sqrt(list_dot_product(c.centroid, c.centroid))) AS cos_raw
        |  FROM embeddings e, cent c),
        |assigned AS (
        |  SELECT vec_id, embedding, cell FROM (
        |    SELECT vec_id, embedding, cell,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY round(cos_raw, 6) DESC, cell) AS rk
        |    FROM scored) WHERE rk = 1),
        |probe AS (
        |  SELECT q.vec_id AS qid, e.vec_id AS eid,
        |    list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) /
        |      (sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[]))) *
        |       sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))) AS cos_raw
        |  FROM assigned q JOIN assigned e ON q.cell = e.cell AND q.vec_id != e.vec_id
        |  WHERE q.vec_id < 5),
        |ranked AS (
        |  SELECT qid, eid, round(cos_raw, 6) AS cos,
        |    row_number() OVER (PARTITION BY qid ORDER BY round(cos_raw, 6) DESC, eid) AS rk
        |  FROM probe)
        |SELECT qid, eid, cos, rk FROM ranked WHERE rk <= 3
        |ORDER BY qid, rk""".stripMargin
  )
}
