package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Clustering over the `embeddings` table — the model-state-is-small,
  * corpus-is-huge iteration pattern (k-means for data curation: SemDeDup
  * partitions, domain discovery, diversity sampling all start from a
  * k-means pass over document embeddings).
  *
  * Everything is EXACT integer/IEEE-pinned arithmetic so a distributed
  * run hash-matches the single-threaded SQL oracle:
  *   - vectors quantize once to 1e6-scaled BIGINT components
  *     (`floor(x*1e6 + 0.5)` — the same double multiply+floor on both
  *     engines);
  *   - distances are integer sums of squares (max |q| ~ 6e5 ->
  *     64 * (1.2e6)^2 ~ 9e13, comfortably in 64 bits);
  *   - centroid updates divide the exact integer component sum by the
  *     member count in DOUBLE (sums < 2^53, so the division is the same
  *     IEEE op in both engines) and round back to the integer grid;
  *   - seeds are the K smallest md5(vec_id) — no RNG anywhere.
  *
  * Scale shape (100 TB): the model (K x 64 longs) rides in a single
  * broadcast row; assignment is a ROW-LOCAL argmin over the broadcast
  * centroid array (`array_min` over struct(dist, cid) — lexicographic
  * struct ordering gives the deterministic tiebreak), so the corpus is
  * scanned once per iteration and NEVER shuffled by key; the update
  * aggregate explodes to (cid, dim) keys — at most K*64 = 512 groups, so
  * map-side partial aggregation reduces each task's output to the model
  * size. Per iteration: one scan, one tiny exchange. That is the textbook
  * distributed Lloyd step (MLlib's KMeans has the same dataflow, with
  * float accumulation this gate could not hash-check).
  */
object ClusterOps {

  /** DuckDB SQL for Lloyd iteration k: distances to c{k-1}, argmin
    * assignment, per-(cid,dim) integer mean, empty clusters keep their
    * previous centroid. */
  private def kmIter(k: Int): String =
    s"""d$k AS (
       |  SELECT q.vec_id, c.cid,
       |    sum((q.qv[u.i+1] - c.cv[u.i+1]) * (q.qv[u.i+1] - c.cv[u.i+1])) AS dist
       |  FROM q, c${k - 1} c, LATERAL (SELECT unnest(generate_series(0, 63)) AS i) u
       |  GROUP BY q.vec_id, c.cid),
       |a$k AS (
       |  SELECT vec_id, cid FROM (
       |    SELECT vec_id, cid,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rk
       |    FROM d$k) WHERE rk = 1),
       |s$k AS (
       |  SELECT a.cid, u.i AS pos,
       |    CAST(floor(CAST(sum(q.qv[u.i+1]) AS DOUBLE) / count(*) + 0.5) AS BIGINT) AS cvi
       |  FROM a$k a JOIN q ON a.vec_id = q.vec_id,
       |    LATERAL (SELECT unnest(generate_series(0, 63)) AS i) u
       |  GROUP BY a.cid, u.i),
       |c$k AS (
       |  SELECT c.cid, CASE WHEN u.cid IS NULL THEN c.cv ELSE u.cv END AS cv
       |  FROM c${k - 1} c LEFT JOIN
       |    (SELECT cid, list(cvi ORDER BY pos) AS cv FROM s$k GROUP BY cid) u
       |    ON c.cid = u.cid)""".stripMargin

  /** The shared K=8 / 3-iteration Lloyd pipeline (see object doc):
    * returns (final centroids as (cid, cv), final assignment as
    * (vec_id, qv, cid, dist)). c1 aggregates it; c3 scores it. */
  private def lloyd(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.load(s, dir, "embeddings")
    // quantize once; eager checkpoint — seeds + 4 assignment scans all
    // read this leaf instead of re-decoding the parquet floats
    val q = e.select(col("vec_id"),
        expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT))")
          .as("qv"))
      .localCheckpoint(true)
    // deterministic seeds: the 8 smallest md5(vec_id); cid = md5 rank
    val seeds = q
      .select(col("vec_id"), col("qv"), md5(col("vec_id").cast("string")).as("h"))
      .orderBy(col("h"), col("vec_id")).limit(8)
    var cent = seeds
      .withColumn("cid",
        (row_number().over(Window.orderBy(col("h"), col("vec_id"))) - 1).cast("long"))
      .select(col("cid"), col("qv").as("cv"))
      .localCheckpoint(true)
    // the whole model as ONE broadcast row: assignment becomes a
    // row-local argmin (no n x K explode, no exchange) via the
    // codegen'd nearest_centroid expression — the equivalent
    // array_min(transform(aggregate(...))) HOF chain ran interpreted
    // (K*64 lambda dispatches per row) and was the corpus-sized cost
    // of c1/c3; ties break to the smallest cid in both forms
    def assign(c: DataFrame): DataFrame = {
      val cmat = c.agg(expr("array_sort(collect_list(struct(cid, cv)))").as("cs"))
      q.crossJoin(broadcast(cmat))
        .select(col("vec_id"), col("qv"),
          graft.functions.nearest_centroid(col("qv"), col("cs")).as("m"))
        .select(col("vec_id"), col("qv"),
          col("m.cid").as("cid"), col("m.dist").as("dist"))
    }
    for (_ <- 1 to 3) {
      // per-(cid, dim) exact integer sums -> <= K*64 groups; map-side
      // partials shrink each task's contribution to model size
      val sums = assign(cent)
        .select(col("cid"), posexplode(col("qv")).as(Seq("pos", "v")))
        .groupBy(col("cid"), col("pos"))
        .agg(expr("CAST(floor(CAST(sum(v) AS DOUBLE) / count(1) + 0.5) AS BIGINT)").as("cvi"))
      val upd = sums.groupBy(col("cid"))
        .agg(expr("transform(array_sort(collect_list(struct(pos, cvi))), x -> x.cvi)").as("ncv"))
      cent = cent.join(upd, Seq("cid"), "left")
        .select(col("cid"), coalesce(col("ncv"), col("cv")).as("cv"))
        .localCheckpoint(false)
    }
    (cent, assign(cent))
  }

  /** [[lloyd]] materialized once per corpus (the [[Materialized]]
    * pattern): c1/c3/c4/c5 each consumed the full 3-iteration pipeline
    * — 4 corpus assignment scans apiece — to read a model the first
    * fit already determined. The artifacts are the K-row centroid
    * table and the per-vector assignment (one row per embedding, far
    * smaller than the float corpus it derives from); every consumer
    * is a scan + model-sized aggregate thereafter. */
  private def lloydShared(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val out = Materialized.rels(s, s"lloyd-${Materialized.dirTag(s, dir)}",
      Seq("cent", "assigned")) {
      val (cent, assigned) = lloyd(s, dir)
      Seq(cent, assigned)
    }
    (out(0), out(1))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // --- k-means (K=8, 3 Lloyd iterations) over the embedding corpus:
    //     cluster sizes, first centroid component, centroid component
    //     sum, and within-cluster inertia after the final assignment.
    //     Integer-exact end to end (see object doc) so the distributed
    //     run hash-matches DuckDB's unrolled-CTE oracle. ---
    "c1_kmeans" -> ((s, dir) => {
      val (cent, assigned) = lloydShared(s, dir)
      val fin = assigned
        .groupBy(col("cid"))
        .agg(count(lit(1)).as("n_members"), sum(col("dist")).as("inertia"))
      // fin is bounded by its group key: <= K = 8 rows no matter the
      // corpus. Spark's post-aggregate size estimate scales with the
      // INPUT, so at the 100x corpus the planner mis-prices it past
      // the broadcast threshold and degrades this K-row join-back to
      // a sort-merge join (caught by PlanShapeSpec at sf10, r19); the
      // hint declares the key-cardinality bound the planner can't see.
      cent.join(broadcast(fin), Seq("cid"), "left")
        .select(col("cid"),
          coalesce(col("n_members"), lit(0L)).as("n_members"),
          expr("cv[0]").as("c_first"),
          expr("CAST(aggregate(cv, CAST(0 AS BIGINT), (acc, x) -> acc + x) AS BIGINT)").as("c_sum"),
          coalesce(col("inertia"), lit(0L)).as("inertia"))
        .orderBy(col("cid"))
    }),

    // --- grid-density clustering (DBSCAN's grid approximation): points
    //     land in h=0.1 cells on the first two embedding dims, cells
    //     with >= 8 points are "dense", and dense cells merge with their
    //     8-neighborhood through 2 rounds of min-label propagation —
    //     the density-based complement to c1's centroid clustering
    //     (finds arbitrary-shaped blobs, labels sparse cells noise).
    //     All arithmetic is exact: floor(double/0.1) quantization is
    //     the same IEEE op both engines, labels are integer cell ids,
    //     min() can't drift. Scale shape: the corpus contributes one
    //     hash aggregate (cell counts); everything after runs on the
    //     CELL relation (corpus/density smaller). The 8-neighborhood
    //     lookup is an EQUI-join — each cell explodes its 9 neighbor
    //     coordinates row-locally and joins on exact (gx, gy) — not a
    //     range join, so it stays codegen + shuffle-hash at any scale. ---
    "c2_grid_density" -> ((s, dir) => {
      val pts = Tables.load(s, dir, "embeddings")
        .select(col("vec_id"),
          floor(col("embedding").getItem(0).cast("double") / 0.1).cast("long").as("gx"),
          floor(col("embedding").getItem(1).cast("double") / 0.1).cast("long").as("gy"))
      val dense = pts.groupBy(col("gx"), col("gy"))
        .agg(count(lit(1)).as("n_pts"))
        .filter(col("n_pts") >= 8)
        // cell-id pack: the gy stride (1e7) must exceed any possible
        // gy + 1e6 offset span or distinct cells would collide (and the
        // oracle, packing identically, would agree on the wrong merge);
        // |coords| < 9e6 keeps the pack under 2^63
        .withColumn("cid", expr("(gx + 1000000) * 10000000 + (gy + 1000000)"))
        .localCheckpoint(true)
      var lab = dense.select(col("gx"), col("gy"), col("cid").as("lbl"))
      for (_ <- 1 to 2) {
        lab = dense.select(col("gx"), col("gy"))
          .withColumn("o", explode(expr(
            "flatten(transform(sequence(-1, 1), dx ->" +
              " transform(sequence(-1, 1), dy -> struct(dx AS dx, dy AS dy))))")))
          .select(col("gx"), col("gy"),
            (col("gx") + col("o.dx")).as("ngx"), (col("gy") + col("o.dy")).as("ngy"))
          .join(lab.select(col("gx").as("ngx"), col("gy").as("ngy"), col("lbl")),
            Seq("ngx", "ngy"))
          .groupBy(col("gx"), col("gy"))
          .agg(min(col("lbl")).as("lbl"))
      }
      dense.join(lab, Seq("gx", "gy"))
        .groupBy(col("lbl"))
        .agg(count(lit(1)).as("n_cells"), sum(col("n_pts")).cast("long").as("n_points"))
        .select(col("lbl").as("cluster"), col("n_cells"), col("n_points"))
        .orderBy(col("n_points").desc, col("cluster"))
    }),

    // --- cluster-quality metrics over c1's clustering (the evaluation
    //     pass that decides whether a curation k-means is usable):
    //     per-cluster scatter, nearest other centroid, and the
    //     Davies-Bouldin term max_j (S_i + S_j) / d_ij. Determinism
    //     discipline: scatter is sqrt(sum(dist)/n) — the SUM is an exact
    //     BIGINT (never a float accumulation, whose order would drift
    //     distributed), so the one sqrt/divide runs on identical
    //     integers in both engines; centroid pair distances are exact
    //     integer sums over the K x K grid (64 rows — driver-trivial,
    //     broadcast). Corpus cost: the one assignment scan lloyd()
    //     already produces; everything else is model-sized. ---
    "c3_cluster_metrics" -> ((s, dir) => {
      val (cent, assigned) = lloydShared(s, dir)
      val scat = assigned.groupBy(col("cid"))
        .agg(count(lit(1)).as("n_members"),
          sum(col("dist")).cast("long").as("sum_d2"))
        .select(col("cid"), col("n_members"),
          sqrt(col("sum_d2") / col("n_members")).as("s"))
      val pairs = cent.select(col("cid").as("i"), col("cv").as("ci"))
        .join(broadcast(cent.select(col("cid").as("j"), col("cv").as("cj"))))
        .filter(col("i") =!= col("j"))
        .select(col("i"), col("j"), expr(
          "sqrt(CAST(aggregate(sequence(0, 63), CAST(0 AS BIGINT)," +
            " (acc, k) -> acc + (ci[k] - cj[k]) * (ci[k] - cj[k])) AS DOUBLE))")
          .as("dij"))
      val db = pairs
        .join(scat.select(col("cid").as("i"), col("s").as("si")), Seq("i"))
        .join(scat.select(col("cid").as("j"), col("s").as("sj")), Seq("j"))
        .groupBy(col("i"))
        .agg(max(round((col("si") + col("sj")) / col("dij"), 6)).as("db_term"),
          min(struct(round(col("dij"), 4).as("d"), col("j"))).as("nn"))
      scat.join(db, col("cid") === col("i"))
        .select(col("cid"), col("n_members"), round(col("s"), 4).as("scatter"),
          col("nn.j").as("nn_cid"), col("nn.d").as("nn_dist"), col("db_term"))
        .orderBy(col("cid"))
    }),

    // --- external clustering evaluation: adjusted Rand index between
    //     c1's k-means assignment and the corpus's true labels — "did
    //     the clustering recover the structure?", the metric that
    //     decides whether a curation k-means is trustworthy. Every
    //     ARI ingredient is an exact BIGINT: the contingency table
    //     (cid x label counts), its row/column sums, and the pair
    //     counts C(x,2) = x*(x-1) div 2 — floats enter only in the
    //     final one-row index formula, computed from identical
    //     integers in both engines. Shape: the one assignment scan
    //     lloyd() already produces, a K x L hash aggregate (64 cells),
    //     then driver-trivial sums. At ~1e10 rows the C(x,2) products
    //     approach 2^63 — widen to DECIMAL(38,0), same plan. ---
    "c4_ari" -> ((s, dir) => {
      val (_, assigned) = lloydShared(s, dir)
      val lab = Tables.load(s, dir, "embeddings")
        .select(col("vec_id"), col("label"))
      val cont = assigned.select(col("vec_id"), col("cid"))
        .join(lab, Seq("vec_id"))
        .groupBy(col("cid"), col("label")).agg(count(lit(1)).as("nij"))
        .localCheckpoint(true) // three aggregates below consume it
      val sij = cont.agg(
        sum(expr("nij * (nij - 1) div 2")).cast("long").as("sij"),
        sum(col("nij")).cast("long").as("n"))
      val sa = cont.groupBy(col("cid")).agg(sum(col("nij")).as("ai"))
        .agg(sum(expr("ai * (ai - 1) div 2")).cast("long").as("sa"))
      val sb = cont.groupBy(col("label")).agg(sum(col("nij")).as("bj"))
        .agg(sum(expr("bj * (bj - 1) div 2")).cast("long").as("sb"))
      sij.crossJoin(broadcast(sa)).crossJoin(broadcast(sb))
        .select(col("n"), col("sij"), col("sa"), col("sb"),
          round((col("sij") - col("sa") * col("sb") / expr("n * (n - 1) div 2")) /
            ((col("sa") + col("sb")) / 2.0 -
              col("sa") * col("sb") / expr("n * (n - 1) div 2")), 6).as("ari"))
    }),

    // --- simplified silhouette over c1's clustering — the silhouette
    //     variant large-scale evaluators actually compute (distances to
    //     CENTROIDS, not all member pairs: O(nK) instead of the O(n^2)
    //     that cannot exist at corpus scale): a_i = dist to own
    //     centroid, b_i = min dist to any OTHER centroid, s_i =
    //     (b - a) / max(a, b). Determinism discipline: a^2/b^2 are the
    //     exact integer squared distances both engines already compute,
    //     the one sqrt/divide runs on identical integers, and s_i is
    //     scaled to micro-unit LONGS per point before the per-cluster
    //     mean (v18's rule) so a distributed sum cannot flip a round-6
    //     digit. Corpus cost: the one assignment scan lloyd() already
    //     pays plus one row-local pass against the broadcast K x 64
    //     model (the K-1 "other centroid" mins are HOF arithmetic on
    //     the broadcast row — interpreted, but K*64 ops/row and zero
    //     exchanges); the rollup is model-sized. ---
    "c5_silhouette" -> ((s, dir) => {
      val (cent, assigned) = lloydShared(s, dir)
      val cmat = cent.agg(expr("array_sort(collect_list(struct(cid, cv)))").as("cs"))
      val withB = assigned.crossJoin(broadcast(cmat))
        .select(col("cid"), col("dist").as("a2"),
          expr("array_min(transform(filter(cs, c -> c.cid != cid), " +
            "c -> aggregate(sequence(0, 63), CAST(0 AS BIGINT), " +
            "(acc, k) -> acc + (qv[k] - c.cv[k]) * (qv[k] - c.cv[k]))))").as("b2"))
      val sPpm = withB.select(col("cid"),
        when(greatest(col("a2"), col("b2")) > 0,
          expr("CAST(round((sqrt(CAST(b2 AS DOUBLE)) - sqrt(CAST(a2 AS DOUBLE))) / " +
            "greatest(sqrt(CAST(a2 AS DOUBLE)), sqrt(CAST(b2 AS DOUBLE))) * 1000000) " +
            "AS BIGINT)"))
          .otherwise(0L).as("s_ppm"))
      sPpm.groupBy(col("cid"))
        .agg(count(lit(1)).as("n_members"), sum(col("s_ppm")).as("sum_ppm"))
        .select(col("cid"), col("n_members"),
          round(col("sum_ppm") / col("n_members") / 1e6, 6).as("mean_silhouette"))
        .orderBy(col("cid"))
    })
  )

  val oracles: Map[String, String] = Map(
    "c1_kmeans" ->
      s"""WITH q AS (
         |  SELECT vec_id,
         |    list_transform(CAST(embedding AS DOUBLE[]),
         |      x -> CAST(floor(x * 1000000 + 0.5) AS BIGINT)) AS qv
         |  FROM embeddings),
         |seeds AS (
         |  SELECT vec_id, qv, md5(CAST(vec_id AS VARCHAR)) AS h
         |  FROM q ORDER BY h, vec_id LIMIT 8),
         |c0 AS (
         |  SELECT row_number() OVER (ORDER BY h, vec_id) - 1 AS cid, qv AS cv
         |  FROM seeds),
         |${kmIter(1)},
         |${kmIter(2)},
         |${kmIter(3)},
         |d4 AS (
         |  SELECT q.vec_id, c.cid,
         |    sum((q.qv[u.i+1] - c.cv[u.i+1]) * (q.qv[u.i+1] - c.cv[u.i+1])) AS dist
         |  FROM q, c3 c, LATERAL (SELECT unnest(generate_series(0, 63)) AS i) u
         |  GROUP BY q.vec_id, c.cid),
         |a4 AS (
         |  SELECT vec_id, cid, dist FROM (
         |    SELECT vec_id, cid, dist,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rk
         |    FROM d4) WHERE rk = 1),
         |fin AS (
         |  SELECT cid, CAST(count(*) AS BIGINT) AS n_members,
         |    CAST(sum(dist) AS BIGINT) AS inertia
         |  FROM a4 GROUP BY cid)
         |SELECT c.cid, COALESCE(fin.n_members, 0) AS n_members,
         |  c.cv[1] AS c_first,
         |  CAST(list_sum(c.cv) AS BIGINT) AS c_sum,
         |  COALESCE(fin.inertia, 0) AS inertia
         |FROM c3 c LEFT JOIN fin ON c.cid = fin.cid
         |ORDER BY c.cid""".stripMargin,

    // same Lloyd preamble as c1; scatter/pair distances are sqrt+divide
    // over exact integers, so every float is computed from identical
    // inputs in both engines
    "c3_cluster_metrics" ->
      s"""WITH q AS (
         |  SELECT vec_id,
         |    list_transform(CAST(embedding AS DOUBLE[]),
         |      x -> CAST(floor(x * 1000000 + 0.5) AS BIGINT)) AS qv
         |  FROM embeddings),
         |seeds AS (
         |  SELECT vec_id, qv, md5(CAST(vec_id AS VARCHAR)) AS h
         |  FROM q ORDER BY h, vec_id LIMIT 8),
         |c0 AS (
         |  SELECT row_number() OVER (ORDER BY h, vec_id) - 1 AS cid, qv AS cv
         |  FROM seeds),
         |${kmIter(1)},
         |${kmIter(2)},
         |${kmIter(3)},
         |d4 AS (
         |  SELECT q.vec_id, c.cid,
         |    sum((q.qv[u.i+1] - c.cv[u.i+1]) * (q.qv[u.i+1] - c.cv[u.i+1])) AS dist
         |  FROM q, c3 c, LATERAL (SELECT unnest(generate_series(0, 63)) AS i) u
         |  GROUP BY q.vec_id, c.cid),
         |a4 AS (
         |  SELECT vec_id, cid, dist FROM (
         |    SELECT vec_id, cid, dist,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rk
         |    FROM d4) WHERE rk = 1),
         |scat AS (
         |  SELECT cid, CAST(count(*) AS BIGINT) AS n_members,
         |    sqrt(CAST(sum(dist) AS BIGINT) / count(*)) AS s
         |  FROM a4 GROUP BY cid),
         |pr AS (
         |  SELECT a.cid AS i, b.cid AS j,
         |    sqrt(CAST(sum((a.cv[u.k+1] - b.cv[u.k+1]) * (a.cv[u.k+1] - b.cv[u.k+1])) AS DOUBLE)) AS dij
         |  FROM c3 a, c3 b, LATERAL (SELECT unnest(generate_series(0, 63)) AS k) u
         |  WHERE a.cid != b.cid GROUP BY a.cid, b.cid),
         |nn AS (
         |  SELECT i, j AS nn_cid, round(dij, 4) AS nn_dist FROM (
         |    SELECT i, j, dij,
         |      row_number() OVER (PARTITION BY i ORDER BY round(dij, 4), j) AS rk
         |    FROM pr) WHERE rk = 1),
         |dbt AS (
         |  SELECT pr.i, max(round((si.s + sj.s) / pr.dij, 6)) AS db_term
         |  FROM pr JOIN scat si ON pr.i = si.cid JOIN scat sj ON pr.j = sj.cid
         |  GROUP BY pr.i)
         |SELECT scat.cid, scat.n_members, round(scat.s, 4) AS scatter,
         |  nn.nn_cid, nn.nn_dist, dbt.db_term
         |FROM scat JOIN nn ON scat.cid = nn.i JOIN dbt ON scat.cid = dbt.i
         |ORDER BY scat.cid""".stripMargin,

    // the same Lloyd preamble as c1; the ARI ingredients are exact
    // BIGINTs, the index formula runs on identical integers
    "c4_ari" ->
      s"""WITH q AS (
         |  SELECT vec_id,
         |    list_transform(CAST(embedding AS DOUBLE[]),
         |      x -> CAST(floor(x * 1000000 + 0.5) AS BIGINT)) AS qv
         |  FROM embeddings),
         |seeds AS (
         |  SELECT vec_id, qv, md5(CAST(vec_id AS VARCHAR)) AS h
         |  FROM q ORDER BY h, vec_id LIMIT 8),
         |c0 AS (
         |  SELECT row_number() OVER (ORDER BY h, vec_id) - 1 AS cid, qv AS cv
         |  FROM seeds),
         |${kmIter(1)},
         |${kmIter(2)},
         |${kmIter(3)},
         |d4 AS (
         |  SELECT q.vec_id, c.cid,
         |    sum((q.qv[u.i+1] - c.cv[u.i+1]) * (q.qv[u.i+1] - c.cv[u.i+1])) AS dist
         |  FROM q, c3 c, LATERAL (SELECT unnest(generate_series(0, 63)) AS i) u
         |  GROUP BY q.vec_id, c.cid),
         |a4 AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rk
         |    FROM d4) WHERE rk = 1),
         |cont AS (
         |  SELECT a4.cid, e.label, CAST(count(*) AS BIGINT) AS nij
         |  FROM a4 JOIN embeddings e ON a4.vec_id = e.vec_id
         |  GROUP BY 1, 2),
         |ar1 AS (SELECT CAST(sum(nij * (nij - 1) // 2) AS BIGINT) AS sij,
         |               CAST(sum(nij) AS BIGINT) AS n FROM cont),
         |ar2 AS (SELECT CAST(sum(ai * (ai - 1) // 2) AS BIGINT) AS sa FROM
         |          (SELECT CAST(sum(nij) AS BIGINT) AS ai FROM cont GROUP BY cid)),
         |ar3 AS (SELECT CAST(sum(bj * (bj - 1) // 2) AS BIGINT) AS sb FROM
         |          (SELECT CAST(sum(nij) AS BIGINT) AS bj FROM cont GROUP BY label))
         |SELECT n, sij, sa, sb,
         |  round((sij - sa * sb / (n * (n - 1) // 2)) /
         |    ((sa + sb) / 2.0 - sa * sb / (n * (n - 1) // 2)), 6) AS ari
         |FROM ar1, ar2, ar3""".stripMargin,

    // the same 2 min-label rounds; DuckDB's BETWEEN form of the
    // 8-neighborhood is value-identical to the Spark equi-join on
    // exploded neighbor coordinates
    "c2_grid_density" ->
      """WITH pts AS (
        |  SELECT vec_id,
        |    CAST(floor(CAST(embedding[1] AS DOUBLE) / 0.1) AS BIGINT) AS gx,
        |    CAST(floor(CAST(embedding[2] AS DOUBLE) / 0.1) AS BIGINT) AS gy
        |  FROM embeddings),
        |dense AS (
        |  SELECT gx, gy, count(*) AS n_pts,
        |    (gx + 1000000) * 10000000 + (gy + 1000000) AS cid
        |  FROM pts GROUP BY gx, gy HAVING count(*) >= 8),
        |l0 AS (SELECT gx, gy, cid AS lbl FROM dense),
        |l1 AS (
        |  SELECT a.gx, a.gy, min(b.lbl) AS lbl
        |  FROM dense a JOIN l0 b
        |    ON b.gx BETWEEN a.gx - 1 AND a.gx + 1
        |   AND b.gy BETWEEN a.gy - 1 AND a.gy + 1
        |  GROUP BY a.gx, a.gy),
        |l2 AS (
        |  SELECT a.gx, a.gy, min(b.lbl) AS lbl
        |  FROM dense a JOIN l1 b
        |    ON b.gx BETWEEN a.gx - 1 AND a.gx + 1
        |   AND b.gy BETWEEN a.gy - 1 AND a.gy + 1
        |  GROUP BY a.gx, a.gy)
        |SELECT l2.lbl AS cluster, count(*) AS n_cells,
        |  CAST(sum(dense.n_pts) AS BIGINT) AS n_points
        |FROM dense JOIN l2 ON dense.gx = l2.gx AND dense.gy = l2.gy
        |GROUP BY l2.lbl ORDER BY n_points DESC, cluster""".stripMargin,

    // the same Lloyd preamble as c1; d4 already holds every (vec, cid)
    // squared distance, so b_i is a min over the non-assigned rows;
    // s_i scales to micro-unit BIGINTs before the per-cluster mean
    // (order-invariant, the v18 rule)
    "c5_silhouette" ->
      s"""WITH q AS (
         |  SELECT vec_id,
         |    list_transform(CAST(embedding AS DOUBLE[]),
         |      x -> CAST(floor(x * 1000000 + 0.5) AS BIGINT)) AS qv
         |  FROM embeddings),
         |seeds AS (
         |  SELECT vec_id, qv, md5(CAST(vec_id AS VARCHAR)) AS h
         |  FROM q ORDER BY h, vec_id LIMIT 8),
         |c0 AS (
         |  SELECT row_number() OVER (ORDER BY h, vec_id) - 1 AS cid, qv AS cv
         |  FROM seeds),
         |${kmIter(1)},
         |${kmIter(2)},
         |${kmIter(3)},
         |d4 AS (
         |  SELECT q.vec_id, c.cid,
         |    sum((q.qv[u.i+1] - c.cv[u.i+1]) * (q.qv[u.i+1] - c.cv[u.i+1])) AS dist
         |  FROM q, c3 c, LATERAL (SELECT unnest(generate_series(0, 63)) AS i) u
         |  GROUP BY q.vec_id, c.cid),
         |a4 AS (
         |  SELECT vec_id, cid, dist FROM (
         |    SELECT vec_id, cid, dist,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rk
         |    FROM d4) WHERE rk = 1),
         |b AS (
         |  SELECT d4.vec_id, min(d4.dist) AS b2
         |  FROM d4 JOIN a4 ON d4.vec_id = a4.vec_id AND d4.cid != a4.cid
         |  GROUP BY d4.vec_id),
         |sp AS (
         |  SELECT a4.cid,
         |    CASE WHEN greatest(a4.dist, b.b2) > 0 THEN
         |      CAST(round((sqrt(CAST(b.b2 AS DOUBLE)) - sqrt(CAST(a4.dist AS DOUBLE))) /
         |        greatest(sqrt(CAST(a4.dist AS DOUBLE)), sqrt(CAST(b.b2 AS DOUBLE)))
         |        * 1000000) AS BIGINT)
         |    ELSE CAST(0 AS BIGINT) END AS s_ppm
         |  FROM a4 JOIN b ON a4.vec_id = b.vec_id)
         |SELECT cid, CAST(count(*) AS BIGINT) AS n_members,
         |  round(CAST(sum(s_ppm) AS BIGINT) / count(*) / 1000000.0, 6)
         |    AS mean_silhouette
         |FROM sp GROUP BY cid ORDER BY cid""".stripMargin
  )
}
