package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables

/** Event-time operators over the `events` table (batch forms of the
  * streaming surface; the Structured Streaming equivalents run in
  * `StreamingSpec` with watermarks over the same data).
  *
  * Timestamp parity: every comparison/diff uses per-value truncated epoch
  * seconds (Spark `unix_timestamp` truncates; DuckDB `floor(epoch(ts))`)
  * so both engines floor identically before any arithmetic.
  */
object EventOps {

  private def ev(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // --- Markov transition matrix: (event_type -> next event_type) counts
    //     per user-ordered stream. One window keyed by user_id (uniform
    //     key, scales with users) + one global hash aggregate over the
    //     tiny (from, to) type space — no self-join, no row explosion. ---
    "e12_transitions" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("sec"), col("event_id"))
      ev(s, dir)
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_timestamp(col("ts")).as("sec"))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .withColumn("gap", lead(col("sec"), 1).over(w) - col("sec"))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
        .agg(count(lit(1)).as("n"),
          round(avg(col("gap")), 4).as("avg_gap_sec"))
        .orderBy(col("from_type"), col("to_type"))
    }),

    // --- hourly spike detection: hours where an event type's count sits
    //     more than 3 standard deviations from the type's mean. The
    //     3-sigma test is algebraically cleared of division and sqrt:
    //     (x - S/m)^2 > 9 * (mQ - S^2)/m^2  <=>  (mx - S)^2 > 9(mQ - S^2)
    //     with S = sum(x), Q = sum(x^2) — ALL INTEGER, so the distributed
    //     run can't drift from the oracle by a ulp at the threshold.
    //     The decision is made in 128-bit integer arithmetic (Spark
    //     DECIMAL(38,0) / DuckDB HUGEINT) because the squared terms
    //     exceed Long past |m*x - S| ~ 3e9 (e.g. 1e4 hours x 1e9
    //     events/hour); exactness now holds to ~1e38, i.e. any corpus.
    //     The dev2_scaled/var_scaled DIAGNOSTIC columns stay BIGINT —
    //     they mirror the filter exactly within the Long envelope and
    //     are reporting detail, not the anomaly decision.
    //     Scale shape: two hash aggregates (hourly counts, then per-type
    //     moments over a handful of types) + one broadcast join back —
    //     the monitoring sweep a 100 TB event store runs hourly. ---
    "e13_anomaly" -> ((s, dir) => {
      val hourly = ev(s, dir)
        .select((floor(unix_timestamp(col("ts")) / 3600) * 3600).cast("long").as("bucket"),
          col("event_type"))
        .groupBy(col("event_type"), col("bucket"))
        .agg(count(lit(1)).as("x"))
      val stats = hourly.groupBy(col("event_type"))
        .agg(count(lit(1)).as("m"), sum(col("x")).cast("long").as("sv"),
          sum(col("x") * col("x")).cast("long").as("q"))
      hourly.join(broadcast(stats), Seq("event_type"))
        .filter(expr(
          "(CAST(m AS DECIMAL(38,0)) * x - sv) * (CAST(m AS DECIMAL(38,0)) * x - sv)" +
            " > 9 * (CAST(m AS DECIMAL(38,0)) * q - CAST(sv AS DECIMAL(38,0)) * sv)"))
        .select(col("event_type"), col("bucket"), col("x"),
          expr("(m * x - sv) * (m * x - sv)").as("dev2_scaled"),
          expr("m * q - sv * sv").as("var_scaled"))
        .orderBy(col("event_type"), col("bucket"))
    }),

    // --- count-min sketch heavy hitters (Cormode-Muthukrishnan '05):
    //     the fixed-memory frequency sketch every 100 TB event monitor
    //     runs — a 4 x 256 counter grid (1024 cells TOTAL, independent
    //     of corpus size) built in ONE hash aggregate; estimates are
    //     min-over-rows, so overestimates only. Hashes are md5-derived
    //     (md5_bits) and counters integers, so the whole sketch is
    //     bit-reproducible cross-engine and the oracle hash-matches it —
    //     the exact count rides along to make the overestimate property
    //     visible. The point-query join is against a BROADCAST 1024-row
    //     relation; top-20 is a TakeOrdered, never a global sort. (A
    //     streaming deployment tracks candidate keys online; the sketch
    //     arithmetic is identical.) ---
    "e14_cms_topk" -> ((s, dir) => {
      val depth = 4; val width = 256
      // ONE events-sized aggregate, ever: a user's (r, bucket) cells are
      // functional on user_id, so the sketch counters are the SUM of
      // per-user exact counts falling in each cell — the row-identical
      // replacement for hashing every event occurrence depth times
      // (round 8 exploded events x4 twice: once for the counters, once
      // through a distinct for the point queries). Everything after the
      // first aggregate is user-sized; its two consumers share the
      // aggregate's exchange via AQE reuse — no checkpoint needed.
      val exact = ev(s, dir).select(col("user_id"))
        .groupBy(col("user_id")).agg(count(lit(1)).as("exact_n"))
      val ub = exact
        .select(col("user_id"), col("exact_n"),
          explode(expr(s"sequence(0, ${depth - 1})")).as("r"))
        .select(col("user_id"), col("exact_n"), col("r"),
          expr(s"md5_bits(concat(CAST(r AS STRING), ':', CAST(user_id AS STRING)), 8) % $width")
            .as("b"))
      val cells = ub.groupBy(col("r"), col("b")).agg(sum(col("exact_n")).as("c"))
      val est = ub.join(broadcast(cells), Seq("r", "b"))
        .groupBy(col("user_id")).agg(min(col("c")).cast("long").as("cms_est"))
      exact.join(est, Seq("user_id"))
        .orderBy(col("cms_est").desc, col("user_id")).limit(20)
        .select(col("user_id"), col("exact_n"), col("cms_est"))
        .orderBy(col("cms_est").desc, col("user_id"))
    }),

    // --- gap-based sessionization (30-min inactivity closes a session) ---
    "e2_sessionize" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val withGap = ev(s, dir)
        .select(col("user_id"), col("event_id"), unix_timestamp(col("ts")).as("sec"))
        .withColumn("prev", lag(col("sec"), 1).over(
          Window.partitionBy(col("user_id")).orderBy(col("sec"), col("event_id"))))
        .withColumn("new_sess",
          when(col("prev").isNull || col("sec") - col("prev") > 1800, 1).otherwise(0))
      val sess = withGap
        .withColumn("sess_id", sum(col("new_sess")).over(
          Window.partitionBy(col("user_id")).orderBy(col("sec"), col("event_id"))
            .rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy(col("user_id"), col("sess_id"))
        .agg(count(lit(1)).as("n_events"), (max(col("sec")) - min(col("sec"))).as("dur"))
      sess.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_sessions"),
          sum(col("n_events")).cast("long").as("total_events"),
          round(avg(col("n_events")), 4).as("avg_events_per_session"),
          round(avg(col("dur")), 4).as("avg_session_sec"))
        .orderBy(col("user_id"))
    }),

    // --- as-of (forward) join: first event at or after each order date
    //     (orders are 1992-1998, events 2024 — the backward direction is
    //     empty on this data, so the forward form is the meaningful one) ---
    "e3_asof_join" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders").filter(col("o_custkey") < 100)
        .select(col("o_orderkey"), col("o_custkey"),
          unix_timestamp(col("o_orderdate")).as("osec"))
      val e = ev(s, dir)
        .select(col("user_id"), col("event_id"), unix_timestamp(col("ts")).as("esec"))
      val joined = o.join(e, col("user_id") === col("o_custkey") && col("esec") >= col("osec"))
      val w = Window.partitionBy(col("o_orderkey")).orderBy(col("esec").asc, col("event_id"))
      joined.withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select(col("o_orderkey"), col("event_id"), (col("esec") - col("osec")).as("lead_sec"))
        .orderBy(col("o_orderkey"))
    }),

    // --- range (interval) join: purchase -> errors of the same user
    //     within the next 30 minutes (batch twin of the stream-stream
    //     interval join in graft.streaming.EventStream) ---
    "e5_range_join" -> ((s, dir) => {
      val e = ev(s, dir)
        .select(col("user_id"), col("event_type"), col("event_id"),
          unix_timestamp(col("ts")).as("sec"))
      val p = e.filter(col("event_type") === "purchase")
        .select(col("user_id").as("pu"), col("sec").as("ps"), col("event_id").as("pe"))
      val err = e.filter(col("event_type") === "error")
        .select(col("user_id").as("eu"), col("sec").as("es"), col("event_id").as("ee"))
      p.join(err, col("pu") === col("eu") &&
          col("es") >= col("ps") && col("es") <= col("ps") + 1800)
        .groupBy(col("pu").as("user_id"))
        .agg(count(lit(1)).as("n_pairs"), min(col("es") - col("ps")).as("min_gap_sec"))
        .orderBy(col("user_id"))
    }),

    // --- semi-structured props: JSON field extraction + aggregation ---
    "e4_json_props" -> ((s, dir) => {
      ev(s, dir)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("k")).cast("long").as("sum_k"),
          round(avg(col("k")), 4).as("avg_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        .orderBy(col("event_type"))
    }),

    // --- hopping (sliding) event-time window: 10-minute windows every
    //     5 minutes via the built-in window() generator (each event lands
    //     in exactly 2 windows; the oracle recomputes the same starts
    //     with floor arithmetic). Batch twin of the streaming form. ---
    "e6_hopping_window" -> ((s, dir) => {
      ev(s, dir)
        .select(window(col("ts"), "10 minutes", "5 minutes").as("w"),
          col("event_type"), col("value"))
        .select(unix_timestamp(col("w.start")).as("wstart"), col("event_type"), col("value"))
        .groupBy(col("wstart"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("total_value"))
        .orderBy(col("wstart"), col("event_type"))
    }),

    // --- native session_window operator (vs e2's hand-rolled islands):
    //     30-min gap sessions per user, one row per session. Events merge
    //     iff the next start is strictly inside [prev, prev+30min) — the
    //     oracle replicates that half-open semantics in exact integer
    //     microseconds (epoch_us), never float seconds. ---
    "e7_session_window" -> ((s, dir) => {
      ev(s, dir).filter(col("user_id") < 50)
        .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          unix_timestamp(col("w.start")).as("start_sec"),
          (unix_timestamp(col("w.end")) - unix_timestamp(col("w.start")) - 1800).as("dur_sec"),
          col("n_events"))
        .orderBy(col("user_id"), col("start_sec"))
    }),

    // --- weekly cohort retention: users bucketed by their first active
    //     week, counted in each later week they return. The canonical
    //     product-analytics rollup: two hash aggregates (distinct active
    //     weeks, then per-(cohort, offset) distinct users) — both keyed
    //     uniformly, both map-side combinable; nothing here changes at
    //     100 TB beyond partition counts. ---
    "e8_retention" -> ((s, dir) => {
      val weeks = ev(s, dir)
        .select(col("user_id"), expr("unix_timestamp(ts) div 604800").as("wk"))
        .distinct()
      val cohort = weeks.groupBy(col("user_id")).agg(min(col("wk")).as("cohort_wk"))
      weeks.join(cohort, Seq("user_id"))
        .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("k"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("cohort_wk"), col("k"))
    }),

    // --- ordered funnel (view -> click -> purchase): per-user first-view,
    //     first click at-or-after it, first purchase at-or-after that.
    //     Each stage is a min-aggregate keyed by user (uniform), the
    //     per-stage tables are tiny relative to the event stream and
    //     broadcast into the next stage's filter — the fact table is
    //     scanned once per stage and never self-joined row-to-row. ---
    "e9_funnel" -> ((s, dir) => {
      val e = ev(s, dir).select(col("user_id"), col("event_type"),
        unix_timestamp(col("ts")).as("sec"))
      val v = e.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("sec")).as("tv"))
      val c = e.filter(col("event_type") === "click")
        .join(broadcast(v), Seq("user_id"))
        .filter(col("sec") >= col("tv"))
        .groupBy(col("user_id"), col("tv")).agg(min(col("sec")).as("tc"))
      val p = e.filter(col("event_type") === "purchase")
        .join(broadcast(c), Seq("user_id"))
        .filter(col("sec") >= col("tc"))
        .groupBy(col("user_id"), col("tv"), col("tc")).agg(min(col("sec")).as("tp"))
      val nv = v.agg(count(lit(1)).as("n_view"))
      val nc = c.agg(count(lit(1)).as("n_click"))
      val np = p.agg(count(lit(1)).as("n_purchase"),
        // mean seconds-to-convert, floor(x+.5)-rounded to 4dp so both
        // engines round identical doubles identically
        (floor(sum(col("tp") - col("tv")) * 10000L / count(lit(1)) + 0.5) / 10000.0)
          .as("avg_conv_sec"))
      nv.crossJoin(nc).crossJoin(np)
    }),

    // --- last-touch attribution: each purchase credited to the user's
    //     most recent view/click in the preceding 24 h — the marketing
    //     twin of the as-of join (e3 is forward; this is backward with a
    //     bounded lookback). The range predicate bounds join state the
    //     same way a stream-stream interval join's watermark would; the
    //     per-purchase window ranks only that purchase's in-range
    //     touches. ---
    "e11_attribution" -> ((s, dir) => {
      val e = ev(s, dir).select(col("event_id"), col("user_id"),
        col("event_type"), unix_timestamp(col("ts")).as("sec"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id"), col("sec").as("p_sec"))
      val touches = e.filter(col("event_type").isin("view", "click"))
        .select(col("event_id").as("t_id"), col("user_id"),
          col("event_type").as("touch_type"), col("sec").as("t_sec"))
      val w = Window.partitionBy(col("p_id")).orderBy(col("t_sec").desc, col("t_id").desc)
      purchases.join(touches, Seq("user_id"))
        .filter(col("t_sec") <= col("p_sec") && col("t_sec") >= col("p_sec") - 86400)
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select(col("p_id"), col("t_id"), col("touch_type"),
          (col("p_sec") - col("t_sec")).as("lag_sec"))
        .orderBy(col("p_id"))
    }),

    // --- time-series gap-fill (densification): materialize EVERY hour of
    //     the observed span per event type, zero-fill missing cells, then
    //     window over the dense series (longest empty run per type) — the
    //     sparse-to-dense step a monitoring/feature pipeline needs before
    //     rolling aggregates make sense. The grid is generated by
    //     arithmetic (types x sequence(h0, h1)), never by scanning: at
    //     100 TB the dense grid's size is (span-hours x types), which is
    //     independent of event count; the only wide ops are the per-cell
    //     count and the per-type (tiny-keyed) window. user_id % 100
    //     sparsifies so empty cells exist at every SF. ---
    "e10_gapfill" -> ((s, dir) => {
      val e = ev(s, dir).filter(col("user_id") % 100 === 7)
        .select(col("event_type"),
          floor(unix_timestamp(col("ts")) / 3600).cast("long").as("hr"))
      val bounds = e.groupBy().agg(min(col("hr")).as("h0"), max(col("hr")).as("h1"))
      val grid = e.select(col("event_type")).distinct()
        .crossJoin(broadcast(bounds))
        .select(col("event_type"), explode(expr("sequence(h0, h1)")).as("hr"))
      val obs = e.groupBy(col("event_type"), col("hr")).agg(count(lit(1)).as("cnt"))
      val dense = grid.join(obs, Seq("event_type", "hr"), "left")
        .select(col("event_type"), col("hr"), coalesce(col("cnt"), lit(0L)).as("cnt"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("hr"))
      val zeroRuns = dense
        .withColumn("grp", sum(when(col("cnt") > 0, 1).otherwise(0)).over(
          w.rowsBetween(Window.unboundedPreceding, 0)))
        .filter(col("cnt") === 0)
        .groupBy(col("event_type"), col("grp")).agg(count(lit(1)).as("run"))
        .groupBy(col("event_type")).agg(max(col("run")).as("max_zero_run"))
      dense.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_hours"),
          sum(when(col("cnt") === 0, 1).otherwise(0)).cast("long").as("n_empty"),
          sum(col("cnt")).cast("long").as("n_events"))
        .join(zeroRuns, Seq("event_type"), "left")
        .select(col("event_type"), col("n_hours"), col("n_empty"),
          coalesce(col("max_zero_run"), lit(0L)).as("max_zero_run"), col("n_events"))
        .orderBy(col("event_type"))
    }),

    // --- sliding-window engagement: distinct active users and distinct
    //     purchasers per 6-hour window hopping every 3 hours. The
    //     hop fan-out is a constant factor (window/slide = 2 rows per
    //     event), then ONE hash aggregate with two exact count-distincts
    //     over the same grouping — Spark plans multi-distinct via a
    //     single expand + partial aggregate, no second scan. At 100 TB
    //     the (window, user) key space is what shuffles, which is the
    //     floor for exact sliding distinct counts; the approximate
    //     drop-in is t13's HLL sketch keyed by window. ---
    "e15_sliding_distinct" -> ((s, dir) => {
      ev(s, dir)
        .select(window(col("ts"), "6 hours", "3 hours").as("w"),
          col("user_id"), col("event_type"))
        .select(unix_timestamp(col("w.start")).as("wstart"),
          col("user_id"), col("event_type"))
        .groupBy(col("wstart"))
        .agg(countDistinct(col("user_id")).as("n_users"),
          countDistinct(when(col("event_type") === "purchase",
            col("user_id"))).as("n_buyers"),
          count(lit(1)).as("n_events"))
        .orderBy(col("wstart"))
    }),

    // --- timed conversion funnel: a view "converts" when the same user
    //     purchases within 30 minutes. The naive form is a range join
    //     (every view x every purchase per user); here the range is
    //     bucketed to the 30-minute grid first — a purchase can only
    //     satisfy views in its own or the previous bucket, so purchases
    //     emit TWO bucket keys and the join is pure equi on
    //     (user, bucket) with a row-local time filter after. That keeps
    //     the join shuffle-hash on a high-cardinality key at any scale
    //     (e5's range-join lesson applied to funnel timing); left_semi
    //     dedups multiple qualifying purchases for free. Day keyed by
    //     integer epoch-div so neither engine's date casting enters the
    //     hash. ---
    "e16_timed_funnel" -> ((s, dir) => {
      val W = 1800L
      val ev0 = ev(s, dir)
        .select(col("user_id"), col("event_type"),
          unix_timestamp(col("ts")).as("e"))
      val views = ev0.filter(col("event_type") === "view")
        .select(col("user_id"), col("e"), (col("e") / W).cast("long").as("b"))
      val buys = ev0.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("e").as("pe"),
          explode(array((col("e") / W).cast("long"),
            (col("e") / W).cast("long") - 1)).as("b"))
      // merge, never broadcast (r17 audit) and never shuffle-hash (r18
      // 100x gate): both funnel arms are EVENT-proportional
      // (type-filtered corpus subsets) — the Generate-blind estimate
      // would broadcast the purchase arm, and an SHJ build of an
      // event-proportional arm cannot spill. SMJ's sorts spill, and
      // the (user_id, b) keys are high-cardinality/well-spread.
      val converted = views.join(buys.hint("merge"),
          Seq("user_id", "b"), "inner")
        .filter(col("pe") > col("e") && col("pe") <= col("e") + W)
        .select(col("user_id"), col("e")).distinct()
      views.select(col("user_id"), col("e"))
        .join(converted.withColumn("c", lit(1L)).hint("merge"),
          Seq("user_id", "e"), "left")
        .groupBy((col("e") / 86400L).cast("long").as("day"))
        .agg(count(lit(1)).as("n_views"),
          sum(coalesce(col("c"), lit(0L))).cast("long").as("n_converted"))
        .withColumn("conv_rate",
          round(col("n_converted") / col("n_views"), 6))
        .orderBy(col("day"))
    }),

    // --- RFM segmentation (recency / frequency / monetary), the
    //     classic user-value rollup: per purchaser, days since last
    //     purchase, purchase count, and spend — each scored 1-3 on
    //     FIXED thresholds (ntile would need a global sort and its
    //     bucket edges drift with the data; fixed cutoffs are the
    //     scale-free, engine-invariant form). Spend is quantized to
    //     integer cents BEFORE summing so no float accumulation order
    //     can flip a threshold: round(value*100) is one IEEE multiply +
    //     half-away-from-zero round, identical in both engines, and the
    //     cent sums are exact BIGINTs under any partitioning. Shape:
    //     one purchase-filtered scan, one per-user hash aggregate, a
    //     single-row broadcast for the reference timestamp, then a
    //     27-way-max segment rollup. ---
    "e17_rfm" -> ((s, dir) => {
      val p = ev(s, dir).filter(col("event_type") === "purchase")
        .select(col("user_id"), unix_timestamp(col("ts")).as("e"),
          expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      val ref = p.agg(max(col("e")).as("ref_e"))
      val rfm = p.groupBy(col("user_id"))
        .agg(max(col("e")).as("last_e"), count(lit(1)).as("f"),
          sum(col("cents")).cast("long").as("m_cents"))
        .join(broadcast(ref))
        .select(col("user_id"), col("f"), col("m_cents"),
          ((col("ref_e") - col("last_e")) / 86400L).cast("long").as("r_days"))
      rfm.select(
          when(col("r_days") <= 2, 3).when(col("r_days") <= 7, 2)
            .otherwise(1).as("r_score"),
          when(col("f") >= 16, 3).when(col("f") >= 10, 2)
            .otherwise(1).as("f_score"),
          when(col("m_cents") >= 80000L, 3).when(col("m_cents") >= 40000L, 2)
            .otherwise(1).as("m_score"),
          col("m_cents"))
        .groupBy(col("r_score"), col("f_score"), col("m_score"))
        .agg(count(lit(1)).as("n_users"),
          sum(col("m_cents")).cast("long").as("seg_cents"))
        .orderBy(col("r_score").desc, col("f_score").desc,
          col("m_score").desc)
    }),

    // --- clickstream path mining: the 10 most frequent 3-step event-type
    //     paths. Per-user event order is made total by (ts, event_id) —
    //     same-timestamp events would otherwise make lead() engine-
    //     nondeterministic, which is the classic path-mining footgun.
    //     Shape: one window pass over user-bounded partitions (the
    //     per-user sequence IS the parallel unit), a tiny path rollup
    //     (|event_types|^3 = 125 groups max at any corpus size), then
    //     TakeOrderedAndProject for the global top-10. ---
    "e18_event_paths" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      ev(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("e2", lead(col("event_type"), 1).over(w))
        .withColumn("e3", lead(col("event_type"), 2).over(w))
        .filter(col("e3").isNotNull)
        .select(concat_ws(">", col("event_type"), col("e2"), col("e3")).as("path"))
        .groupBy(col("path")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("path"))
        .limit(10)
    }),

    // --- activity concentration (Gini coefficient per event type): how
    //     unequally each activity spreads across users — the same
    //     measurement corpus curation runs on per-source/per-domain
    //     contribution before capping heavy tails (p5's cap is the
    //     remedy; this is the detector). Gini from the rank formula
    //     G = (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x)) with x sorted
    //     ascending: every sum is an exact BIGINT, and rank ties (equal
    //     x) contribute x*sum(i) regardless of tiebreak order, so the
    //     statistic is partitioning- and tiebreak-invariant; the one
    //     division runs on identical integers in both engines. Shape:
    //     the corpus collapses to (type, user) counts first, so the
    //     rank window runs over the USERS relation, partitioned by
    //     type; at billions of users the p7 two-phase prefix-sum form
    //     replaces the window, same arithmetic. ---
    "e19_gini" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val cnt = ev(s, dir).groupBy(col("event_type"), col("user_id"))
        .agg(count(lit(1)).as("x"))
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("x"), col("user_id"))
      cnt.withColumn("i", row_number().over(w))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_users"),
          sum(col("x")).cast("long").as("n_events"),
          sum(col("i") * col("x")).cast("long").as("six"))
        .select(col("event_type"), col("n_users"), col("n_events"),
          round((lit(2L) * col("six") - (col("n_users") + 1) * col("n_events"))
            .cast("double") /
            (col("n_users") * col("n_events")).cast("double"), 6).as("gini"))
        .orderBy(col("event_type"))
    }),

    // --- per-user behavioral entropy: Shannon entropy of each user's
    //     event-type distribution, H = ln(N) - (1/N)*sum(c*ln c) — the
    //     diversity signal that separates bots (one repeated action,
    //     H ~ 0) from organic users, rolled into quarter-nat histogram
    //     buckets. Determinism: each (user, type) term c*ln(c) is
    //     quantized to integer micro-nats BEFORE the per-user sum, so
    //     the BIGINT sums are aggregation-order invariant; ln only ever
    //     sees exact integer counts (identical doubles both engines),
    //     and single-type users (H that quantizes to ~±1e-7) clamp to
    //     bucket 0 via greatest(H, 0). Shape: two hash aggregates
    //     ((user, type), then user) + a tiny bucket rollup — nothing
    //     wider than the user relation ever shuffles, and the bucket
    //     stats stay order-invariant (count/sum/min/max only). ---
    "e20_user_entropy" -> ((s, dir) => {
      val ct = ev(s, dir).groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("c"))
        .select(col("user_id"), col("c"),
          floor(col("c") * log(col("c").cast("double")) * 1e6 + 0.5)
            .cast("long").as("cl6"))
      val h = ct.groupBy(col("user_id"))
        .agg(sum(col("c")).cast("long").as("n"),
          sum(col("cl6")).cast("long").as("sl6"))
        .select(col("n"),
          greatest(log(col("n").cast("double")) - col("sl6") / 1e6 / col("n"),
            lit(0.0)).as("hn"))
      h.groupBy(floor(col("hn") * 4).cast("long").as("bucket4"))
        .agg(count(lit(1)).as("n_users"),
          sum(col("n")).cast("long").as("n_events"),
          round(min(col("hn")), 4).as("h_min"),
          round(max(col("hn")), 4).as("h_max"))
        .orderBy(col("bucket4"))
    }),

    // --- inter-event periodicity (the metronome bot signal e20's
    //     entropy complements): per user, the variance of consecutive
    //     event gaps, ENTIRELY in exact arithmetic — with m gaps,
    //     S = sum(gap), Q = sum(gap^2), the numerator V = m*Q - S^2 is
    //     computed in DECIMAL(38,0) (e13's overflow discipline: Q alone
    //     can pass 2^63 at ~1e3 gaps of ~1e7 s) and the reported
    //     integer variance is V div m^2 — so the "most regular users"
    //     ranking compares exact integers, nothing can drift. Shape:
    //     one lag window per user (keyed shuffle), one hash aggregate,
    //     TakeOrderedAndProject top-20. ---
    "e21_periodicity" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val gaps = ev(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"),
          unix_timestamp(col("ts")).as("sec"))
        .withColumn("gap", col("sec") - lag(col("sec"), 1).over(w))
        .filter(col("gap").isNotNull)
      gaps.groupBy(col("user_id"))
        .agg(count(lit(1)).as("m"),
          sum(col("gap")).cast("long").as("sg"),
          sum(col("gap") * col("gap")).cast("long").as("qg"))
        .filter(col("m") >= 10)
        .select(col("user_id"), col("m"),
          expr("sg div m").as("mean_gap"),
          expr("CAST((CAST(m AS DECIMAL(38,0)) * qg - CAST(sg AS DECIMAL(38,0)) * sg)" +
            " div (CAST(m AS DECIMAL(38,0)) * m) AS BIGINT)").as("var_gap"))
        .orderBy(col("var_gap"), col("user_id"))
        .limit(20)
    }),

    // --- sliding-window change-point detection (the window form of
    //     CUSUM, which needs a sequential recursion no parallel engine
    //     should run): per event type's hourly count series, the mean
    //     of the 6 hours BEFORE each point vs the 6 AFTER, shift =
    //     after-mean minus before-mean in integer micro-events — both
    //     means are exact integer divisions of BIGINT window sums, so
    //     the top-10 largest shifts rank on exact integers. Full
    //     windows only (count frames guard the edges). Shape: one hash
    //     aggregate to the (type, hour) relation, two ROWS-frame
    //     windows partitioned by type, TakeOrderedAndProject. ---
    // --- customer-lifetime churn hazard with right-censoring — the
    //     discrete Kaplan-Meier life table every retention team builds:
    //     per customer, tenure = quarters between first and last order
    //     (exact calendar-quarter arithmetic, no float month fractions);
    //     customers still ordering within a year of the data horizon are
    //     CENSORED (alive when observation ended), not churned — the
    //     distinction that makes naive "last seen" churn rates wrong.
    //     at_risk(w) is a reverse cumulative sum; hazard the exact
    //     integer ppm died*1e6 div at_risk. Shape: one customer-sized
    //     aggregate, then everything runs on the quarter relation —
    //     bounded by CALENDAR QUARTERS at any corpus size, so the
    //     single-partition window over it is a constant-size tail, not
    //     a scale hazard. ---
    "e23_hazard" -> ((s, dir) => {
      val lives = Tables.load(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(min(col("o_orderdate")).as("f"), max(col("o_orderdate")).as("l"))
        .select(
          ((year(col("l")) - year(col("f"))) * 4 +
            (quarter(col("l")) - quarter(col("f")))).cast("long").as("w"),
          (col("l") >= lit("2000-08-01").cast("timestamp")).as("censored"))
      val byW = lives.groupBy(col("w"))
        .agg(sum(when(col("censored"), 0L).otherwise(1L)).cast("long").as("died"),
          sum(when(col("censored"), 1L).otherwise(0L)).cast("long").as("n_censored"))
      val wRev = Window.orderBy(col("w").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      byW
        .withColumn("at_risk",
          sum(col("died") + col("n_censored")).over(wRev).cast("long"))
        .select(col("w"), col("died"), col("n_censored"), col("at_risk"),
          expr("died * 1000000 div at_risk").as("hazard_ppm"))
        .orderBy(col("w"))
    }),

    // --- SKETCH MERGEABILITY, gated: daily 64-register HLL sketches of
    //     distinct users (t13's hash-exact register algebra over
    //     md5_bits(user_id)) MERGE into weekly range estimates by
    //     register-wise max — the property that lets a warehouse store
    //     one tiny sketch per day/partition and answer any range's
    //     distinct count WITHOUT rescanning events (and the same
    //     algebra that makes the aggregate partial/distributed). The
    //     gate pins est_merged == est_direct (merge of daily sketches
    //     vs the sketch built straight over the week's events) as a
    //     boolean the oracle requires TRUE, plus the exact count for
    //     the error envelope. Scale shape: one events-sized pass into a
    //     (week, day, register)-grouped max — everything after is
    //     calendar-bounded (<= 31 x 64 rows). ---
    "e24_hll_daily_merge" -> ((s, dir) => {
      val regs = ev(s, dir)
        .select(to_date(col("ts")).as("d"),
          expr("md5_bits(CAST(user_id AS STRING), 15)").as("h"))
        .select(col("d"),
          // ABSOLUTE week (epoch-day div 7), not month-relative: a
          // month-relative key would merge "week 0" of different months
          // into one group the moment the events table spans months
          expr("CAST(datediff(d, DATE'1970-01-01') div 7 AS INT)").as("week"),
          col("h"),
          (col("h") % 64).as("register"),
          when(expr("h div 64") === 0, lit(55))
            .otherwise(lit(55) - length(expr("bin(h div 64)"))).as("rho"))
      // ONE events-sized aggregate: per-day registers (the stored
      // per-partition sketches). Exchange reuse serves its consumers.
      val daily = regs.groupBy(col("week"), col("d"), col("register"))
        .agg(max(col("rho")).as("rho_j"))
      def estimate(reg: DataFrame, keys: Seq[String]): DataFrame =
        reg.groupBy(keys.map(col): _*)
          .agg(count(lit(1)).as("n_registers"),
            sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(55 - rho_j AS INT))")).as("sd"))
          .select(keys.map(col) :+
            ((col("sd") + (lit(64L) - col("n_registers")) *
              expr("shiftleft(CAST(1 AS BIGINT), 55)")).as("denom")): _*)
          .withColumn("est", expr(
            "CAST(floor(1.0462993238608057e20 / denom + 0.5) AS BIGINT)"))
      // merge = register-wise max across the week's DAILY sketches
      val merged = estimate(
        daily.groupBy(col("week"), col("register")).agg(max(col("rho_j")).as("rho_j")),
        Seq("week")).select(col("week"), col("est").as("est_merged"))
      // direct = sketch built straight over the week's events
      val direct = estimate(
        regs.groupBy(col("week"), col("register")).agg(max(col("rho")).as("rho_j")),
        Seq("week")).select(col("week"), col("est").as("est_direct"))
      val exact = regs.groupBy(col("week"))
        .agg(count_distinct(col("h")).as("n_exact"))
      merged.join(direct, Seq("week")).join(exact, Seq("week"))
        .select(col("week"), col("est_merged"), col("est_direct"),
          (col("est_merged") === col("est_direct")).as("merge_exact"),
          col("n_exact"))
        .orderBy(col("week"))
    }),

    "e22_changepoint" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val hourly = ev(s, dir)
        .groupBy(col("event_type"),
          floor(unix_timestamp(col("ts")) / 3600).cast("long").as("hr"))
        .agg(count(lit(1)).as("cnt"))
      val wPrev = Window.partitionBy(col("event_type")).orderBy(col("hr"))
        .rowsBetween(-6, -1)
      val wNext = Window.partitionBy(col("event_type")).orderBy(col("hr"))
        .rowsBetween(1, 6)
      hourly
        .withColumn("sp", sum(col("cnt")).over(wPrev))
        .withColumn("np", count(lit(1)).over(wPrev))
        .withColumn("sn", sum(col("cnt")).over(wNext))
        .withColumn("nn", count(lit(1)).over(wNext))
        .filter(col("np") === 6 && col("nn") === 6)
        .select(col("event_type"), col("hr"), col("cnt"),
          expr("sn * 1000000 div nn - sp * 1000000 div np").as("shift6"))
        .orderBy(abs(col("shift6")).desc, col("event_type"), col("hr"))
        .limit(10)
        .select(col("event_type"), col("hr"), col("cnt"),
          round(col("shift6") / 1e6, 4).as("mean_shift"))
    })
  )

  val oracles: Map[String, String] = Map(
    "e15_sliding_distinct" ->
      """SELECT CAST((CAST(floor(epoch(ts) / 10800) AS BIGINT) - j) * 10800 AS BIGINT) AS wstart,
        |  count(DISTINCT user_id) AS n_users,
        |  count(DISTINCT CASE WHEN event_type = 'purchase' THEN user_id END) AS n_buyers,
        |  count(*) AS n_events
        |FROM events, LATERAL (SELECT unnest(generate_series(0, 1)) AS j) u
        |GROUP BY 1 ORDER BY wstart""".stripMargin,

    // the un-bucketed EXISTS form: value-identical to the Spark side's
    // bucketed equi-join because a purchase <= 30 min after a view is
    // always in the view's own or next 30-min bucket
    "e16_timed_funnel" ->
      """WITH v AS (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS e
        |           FROM events WHERE event_type = 'view'),
        |p AS (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS pe
        |      FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT v.user_id, v.e,
        |  CASE WHEN EXISTS (SELECT 1 FROM p WHERE p.user_id = v.user_id
        |                    AND p.pe > v.e AND p.pe <= v.e + 1800)
        |       THEN 1 ELSE 0 END AS conv FROM v)
        |SELECT CAST(e // 86400 AS BIGINT) AS day, count(*) AS n_views,
        |  CAST(sum(conv) AS BIGINT) AS n_converted,
        |  round(sum(conv) * 1.0 / count(*), 6) AS conv_rate
        |FROM c GROUP BY 1 ORDER BY day""".stripMargin,

    "e17_rfm" ->
      """WITH p AS (
        |  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS e,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase'),
        |ref AS (SELECT max(e) AS ref_e FROM p),
        |rfm AS (
        |  SELECT user_id, count(*) AS f, CAST(sum(cents) AS BIGINT) AS m_cents,
        |    CAST((ref_e - max(e)) // 86400 AS BIGINT) AS r_days
        |  FROM p, ref GROUP BY user_id, ref_e),
        |sc AS (
        |  SELECT CASE WHEN r_days <= 2 THEN 3 WHEN r_days <= 7 THEN 2 ELSE 1 END AS r_score,
        |    CASE WHEN f >= 16 THEN 3 WHEN f >= 10 THEN 2 ELSE 1 END AS f_score,
        |    CASE WHEN m_cents >= 80000 THEN 3 WHEN m_cents >= 40000 THEN 2 ELSE 1 END AS m_score,
        |    m_cents
        |  FROM rfm)
        |SELECT r_score, f_score, m_score, count(*) AS n_users,
        |  CAST(sum(m_cents) AS BIGINT) AS seg_cents
        |FROM sc GROUP BY 1, 2, 3
        |ORDER BY r_score DESC, f_score DESC, m_score DESC""".stripMargin,

    "e18_event_paths" ->
      """WITH s AS (
        |  SELECT user_id, event_type,
        |    lead(event_type, 1) OVER w AS e2,
        |    lead(event_type, 2) OVER w AS e3
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT event_type || '>' || e2 || '>' || e3 AS path, count(*) AS n
        |FROM s WHERE e3 IS NOT NULL
        |GROUP BY 1 ORDER BY n DESC, path LIMIT 10""".stripMargin,

    "e19_gini" ->
      """WITH c AS (
        |  SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |r AS (
        |  SELECT event_type, x,
        |    row_number() OVER (PARTITION BY event_type ORDER BY x, user_id) AS i
        |  FROM c),
        |g AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_users,
        |    CAST(sum(x) AS BIGINT) AS n_events,
        |    CAST(sum(i * x) AS BIGINT) AS six
        |  FROM r GROUP BY 1)
        |SELECT event_type, n_users, n_events,
        |  round(CAST(2 * six - (n_users + 1) * n_events AS DOUBLE)
        |    / (n_users * n_events), 6) AS gini
        |FROM g ORDER BY event_type""".stripMargin,

    // identical micro-nat quantization: c*ln(c) floors to BIGINT per
    // (user, type) before any sum, ln only sees exact integers
    "e20_user_entropy" ->
      """WITH c AS (
        |  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |q AS (
        |  SELECT user_id, c,
        |    CAST(floor(c * ln(CAST(c AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS cl6
        |  FROM c),
        |h AS (
        |  SELECT CAST(sum(c) AS BIGINT) AS n,
        |    greatest(ln(CAST(sum(c) AS DOUBLE)) -
        |      CAST(sum(cl6) AS BIGINT) / 1e6 / CAST(sum(c) AS BIGINT), 0.0) AS hn
        |  FROM q GROUP BY user_id)
        |SELECT CAST(floor(hn * 4) AS BIGINT) AS bucket4,
        |  count(*) AS n_users, CAST(sum(n) AS BIGINT) AS n_events,
        |  round(min(hn), 4) AS h_min, round(max(hn), 4) AS h_max
        |FROM h GROUP BY 1 ORDER BY bucket4""".stripMargin,

    // the same exact variance numerator, in HUGEINT: DuckDB's `//` on
    // DECIMAL is fractional (and the BIGINT cast ROUNDS — off-by-one vs
    // Spark's integral `div`); HUGEINT `//` is true integral division
    "e21_periodicity" ->
      """WITH g AS (
        |  SELECT user_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) -
        |      lag(CAST(floor(epoch(ts)) AS BIGINT), 1) OVER w AS gap
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |a AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS m,
        |    CAST(sum(gap) AS BIGINT) AS sg,
        |    CAST(sum(gap * gap) AS BIGINT) AS qg
        |  FROM g WHERE gap IS NOT NULL GROUP BY user_id
        |  HAVING count(*) >= 10)
        |SELECT user_id, m, sg // m AS mean_gap,
        |  CAST((CAST(m AS HUGEINT) * qg - CAST(sg AS HUGEINT) * sg)
        |    // (CAST(m AS HUGEINT) * m) AS BIGINT) AS var_gap
        |FROM a ORDER BY var_gap, user_id LIMIT 20""".stripMargin,

    // the same life table: calendar-quarter tenure, censoring cutoff,
    // reverse cumulative at-risk, exact integer-ppm hazard
    "e23_hazard" ->
      """WITH lives AS (
        |  SELECT o_custkey,
        |    CAST((year(max(o_orderdate)) - year(min(o_orderdate))) * 4 +
        |         (quarter(max(o_orderdate)) - quarter(min(o_orderdate))) AS BIGINT) AS w,
        |    max(o_orderdate) >= TIMESTAMP '2000-08-01' AS censored
        |  FROM orders GROUP BY o_custkey),
        |byw AS (
        |  SELECT w,
        |    CAST(sum(CASE WHEN censored THEN 0 ELSE 1 END) AS BIGINT) AS died,
        |    CAST(sum(CASE WHEN censored THEN 1 ELSE 0 END) AS BIGINT) AS n_censored
        |  FROM lives GROUP BY w),
        |r AS (
        |  SELECT w, died, n_censored,
        |    CAST(sum(died + n_censored) OVER (ORDER BY w DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS at_risk
        |  FROM byw)
        |SELECT w, died, n_censored, at_risk,
        |  died * 1000000 // at_risk AS hazard_ppm
        |FROM r ORDER BY w""".stripMargin,

    // the same register algebra over the same hash; the oracle builds
    // BOTH the merged-from-daily and direct weekly sketches, so the
    // merge_exact boolean is value-checked TRUE, not assumed
    "e24_hll_daily_merge" ->
      """WITH r AS (
        |  SELECT CAST(ts AS DATE) AS d,
        |    CAST((CAST(ts AS DATE) - DATE '1970-01-01') // 7 AS INTEGER) AS week,
        |    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
        |  FROM events),
        |rr AS (
        |  SELECT d, week, h, h % 64 AS register,
        |    CASE WHEN h // 64 = 0 THEN 55
        |         ELSE 55 - length(bin(h // 64)) END AS rho
        |  FROM r),
        |daily AS (SELECT week, d, register, max(rho) AS rho_j
        |          FROM rr GROUP BY 1, 2, 3),
        |mreg AS (SELECT week, register, max(rho_j) AS rho_j
        |         FROM daily GROUP BY 1, 2),
        |dreg AS (SELECT week, register, max(rho) AS rho_j
        |         FROM rr GROUP BY 1, 2),
        |mest AS (
        |  SELECT week,
        |    CAST(floor(1.0462993238608057e20 /
        |      (CAST(sum(CAST(1 AS BIGINT) << CAST(55 - rho_j AS INTEGER)) AS BIGINT)
        |       + (64 - count(*)) * (CAST(1 AS BIGINT) << 55)) + 0.5) AS BIGINT) AS est_merged
        |  FROM mreg GROUP BY week),
        |dest AS (
        |  SELECT week,
        |    CAST(floor(1.0462993238608057e20 /
        |      (CAST(sum(CAST(1 AS BIGINT) << CAST(55 - rho_j AS INTEGER)) AS BIGINT)
        |       + (64 - count(*)) * (CAST(1 AS BIGINT) << 55)) + 0.5) AS BIGINT) AS est_direct
        |  FROM dreg GROUP BY week),
        |ex AS (SELECT week, CAST(count(DISTINCT h) AS BIGINT) AS n_exact
        |       FROM rr GROUP BY week)
        |SELECT mest.week, est_merged, est_direct,
        |  est_merged = est_direct AS merge_exact, n_exact
        |FROM mest JOIN dest USING (week) JOIN ex USING (week)
        |ORDER BY mest.week""".stripMargin,

    // identical ROWS frames and exact integer-division means
    "e22_changepoint" ->
      """WITH h AS (
        |  SELECT event_type,
        |    CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS hr,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1, 2),
        |w AS (
        |  SELECT event_type, hr, cnt,
        |    CAST(sum(cnt) OVER wp AS BIGINT) AS sp, count(*) OVER wp AS np,
        |    CAST(sum(cnt) OVER wn AS BIGINT) AS sn, count(*) OVER wn AS nn
        |  FROM h
        |  WINDOW wp AS (PARTITION BY event_type ORDER BY hr
        |                ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING),
        |         wn AS (PARTITION BY event_type ORDER BY hr
        |                ROWS BETWEEN 1 FOLLOWING AND 6 FOLLOWING))
        |SELECT event_type, hr, cnt,
        |  round((sn * 1000000 // nn - sp * 1000000 // np) / 1e6, 4) AS mean_shift
        |FROM w WHERE np = 6 AND nn = 6
        |ORDER BY abs(sn * 1000000 // nn - sp * 1000000 // np) DESC, event_type, hr
        |LIMIT 10""".stripMargin,
    "e14_cms_topk" ->
      """WITH rr AS (SELECT unnest(generate_series(0, 3)) AS r),
        |k AS (SELECT user_id FROM events),
        |h AS (
        |  SELECT k.user_id, rr.r,
        |    ('0x' || substr(md5(CAST(rr.r AS VARCHAR) || ':' || CAST(k.user_id AS VARCHAR)), 1, 8))::BIGINT % 256 AS b
        |  FROM k, rr),
        |cells AS (SELECT r, b, count(*) AS c FROM h GROUP BY 1, 2),
        |exact AS (SELECT user_id, CAST(count(*) AS BIGINT) AS exact_n FROM k GROUP BY 1),
        |hk AS (SELECT DISTINCT user_id, r, b FROM h),
        |est AS (
        |  SELECT hk.user_id, CAST(min(c.c) AS BIGINT) AS cms_est
        |  FROM hk JOIN cells c USING (r, b) GROUP BY 1)
        |SELECT e.user_id, e.exact_n, est.cms_est
        |FROM exact e JOIN est USING (user_id)
        |ORDER BY cms_est DESC, user_id LIMIT 20""".stripMargin,

    "e13_anomaly" ->
      """WITH h AS (
        |  SELECT event_type,
        |    CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS bucket,
        |    CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |st AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS m,
        |    CAST(sum(x) AS BIGINT) AS sv, CAST(sum(x * x) AS BIGINT) AS q
        |  FROM h GROUP BY 1)
        |SELECT h.event_type, h.bucket, h.x,
        |  (st.m * h.x - st.sv) * (st.m * h.x - st.sv) AS dev2_scaled,
        |  st.m * st.q - st.sv * st.sv AS var_scaled
        |FROM h JOIN st USING (event_type)
        |WHERE (CAST(st.m AS HUGEINT) * h.x - st.sv) * (CAST(st.m AS HUGEINT) * h.x - st.sv)
        |      > 9 * (CAST(st.m AS HUGEINT) * st.q - CAST(st.sv AS HUGEINT) * st.sv)
        |ORDER BY h.event_type, h.bucket""".stripMargin,

    "e12_transitions" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type,
        |         CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events),
        |x AS (
        |  SELECT event_type,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY sec, event_id) AS next_type,
        |    lead(sec) OVER (PARTITION BY user_id ORDER BY sec, event_id) - sec AS gap
        |  FROM e)
        |SELECT event_type AS from_type, next_type AS to_type,
        |  count(*) AS n, round(avg(gap), 4) AS avg_gap_sec
        |FROM x WHERE next_type IS NOT NULL
        |GROUP BY 1, 2 ORDER BY from_type, to_type""".stripMargin,

    "e2_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events),
        |g AS (
        |  SELECT user_id, event_id, sec,
        |    CASE WHEN lag(sec) OVER (PARTITION BY user_id ORDER BY sec, event_id) IS NULL
        |           OR sec - lag(sec) OVER (PARTITION BY user_id ORDER BY sec, event_id) > 1800
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM e),
        |sid AS (
        |  SELECT user_id, sec,
        |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY sec, event_id
        |                        ROWS UNBOUNDED PRECEDING) AS sess_id
        |  FROM g),
        |sess AS (
        |  SELECT user_id, sess_id, count(*) AS n_events,
        |         max(sec) - min(sec) AS dur
        |  FROM sid GROUP BY user_id, sess_id)
        |SELECT user_id, count(*) AS n_sessions,
        |  CAST(sum(n_events) AS BIGINT) AS total_events,
        |  round(avg(n_events), 4) AS avg_events_per_session,
        |  round(avg(dur), 4) AS avg_session_sec
        |FROM sess GROUP BY user_id ORDER BY user_id""".stripMargin,

    "e3_asof_join" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_custkey, CAST(floor(epoch(o_orderdate)) AS BIGINT) AS osec
        |  FROM orders WHERE o_custkey < 100),
        |e AS (
        |  SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS esec FROM events),
        |j AS (
        |  SELECT o.o_orderkey, e.event_id, e.esec - o.osec AS lead_sec,
        |    row_number() OVER (PARTITION BY o.o_orderkey ORDER BY e.esec ASC, e.event_id) AS rk
        |  FROM o JOIN e ON e.user_id = o.o_custkey AND e.esec >= o.osec)
        |SELECT o_orderkey, event_id, lead_sec FROM j WHERE rk = 1
        |ORDER BY o_orderkey""".stripMargin,

    "e5_range_join" ->
      """WITH e AS (
        |  SELECT user_id, event_type, event_id,
        |         CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events),
        |p AS (SELECT user_id AS pu, sec AS ps FROM e WHERE event_type = 'purchase'),
        |err AS (SELECT user_id AS eu, sec AS es FROM e WHERE event_type = 'error')
        |SELECT pu AS user_id, count(*) AS n_pairs,
        |  min(es - ps) AS min_gap_sec
        |FROM p JOIN err ON pu = eu AND es >= ps AND es <= ps + 1800
        |GROUP BY pu ORDER BY user_id""".stripMargin,

    "e4_json_props" ->
      """WITH e AS (
        |  SELECT event_type, CAST(json_extract(props, '$.k') AS BIGINT) AS k
        |  FROM events)
        |SELECT event_type, count(*) AS n, CAST(sum(k) AS BIGINT) AS sum_k,
        |  round(avg(k), 4) AS avg_k, min(k) AS min_k, max(k) AS max_k
        |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin,

    "e6_hopping_window" ->
      """SELECT CAST((CAST(floor(epoch(ts) / 300) AS BIGINT) - j) * 300 AS BIGINT) AS wstart,
        |  event_type, count(*) AS n, round(sum(value), 4) AS total_value
        |FROM events, LATERAL (SELECT unnest(generate_series(0, 1)) AS j) u
        |GROUP BY 1, 2 ORDER BY wstart, event_type""".stripMargin,

    "e7_session_window" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS us FROM events WHERE user_id < 50),
        |g AS (
        |  SELECT user_id, us,
        |    CASE WHEN lag(us) OVER w IS NULL
        |         OR us - lag(us) OVER w >= 1800000000 THEN 1 ELSE 0 END AS brk
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)),
        |s AS (
        |  SELECT user_id, us,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY us ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM g),
        |sess AS (
        |  SELECT user_id, sid, count(*) AS n_events,
        |    CAST(floor(min(us) / 1000000) AS BIGINT) AS start_sec,
        |    CAST(floor(max(us) / 1000000) AS BIGINT)
        |      - CAST(floor(min(us) / 1000000) AS BIGINT) AS dur_sec
        |  FROM s GROUP BY user_id, sid)
        |SELECT user_id, start_sec, dur_sec, n_events
        |FROM sess ORDER BY user_id, start_sec""".stripMargin,

    "e8_retention" ->
      """WITH weeks AS (
        |  SELECT DISTINCT user_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) // 604800 AS wk
        |  FROM events),
        |cohort AS (
        |  SELECT user_id, min(wk) AS cohort_wk FROM weeks GROUP BY user_id)
        |SELECT c.cohort_wk, w.wk - c.cohort_wk AS k,
        |  count(DISTINCT w.user_id) AS n_users
        |FROM weeks w JOIN cohort c USING (user_id)
        |GROUP BY 1, 2 ORDER BY cohort_wk, k""".stripMargin,

    "e9_funnel" ->
      """WITH e AS (
        |  SELECT user_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events),
        |v AS (SELECT user_id, min(sec) AS tv FROM e WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, v.tv, min(sec) AS tc
        |      FROM e JOIN v USING (user_id)
        |      WHERE event_type = 'click' AND sec >= tv GROUP BY e.user_id, v.tv),
        |p AS (SELECT e.user_id, c.tv, c.tc, min(sec) AS tp
        |      FROM e JOIN c USING (user_id)
        |      WHERE event_type = 'purchase' AND sec >= tc GROUP BY e.user_id, c.tv, c.tc)
        |SELECT (SELECT count(*) FROM v) AS n_view,
        |       (SELECT count(*) FROM c) AS n_click,
        |       (SELECT count(*) FROM p) AS n_purchase,
        |       (SELECT floor(CAST(sum(tp - tv) AS BIGINT) * 10000 / count(*) + 0.5) / 10000.0
        |        FROM p) AS avg_conv_sec""".stripMargin,

    "e11_attribution" ->
      """WITH e AS (
        |  SELECT event_id, user_id, event_type,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events),
        |p AS (SELECT event_id AS p_id, user_id, sec AS p_sec
        |      FROM e WHERE event_type = 'purchase'),
        |t AS (SELECT event_id AS t_id, user_id, event_type AS touch_type, sec AS t_sec
        |      FROM e WHERE event_type IN ('view', 'click')),
        |j AS (
        |  SELECT p.p_id, t.t_id, t.touch_type, p.p_sec - t.t_sec AS lag_sec,
        |    row_number() OVER (PARTITION BY p.p_id
        |      ORDER BY t.t_sec DESC, t.t_id DESC) AS rk
        |  FROM p JOIN t ON p.user_id = t.user_id
        |  WHERE t.t_sec <= p.p_sec AND t.t_sec >= p.p_sec - 86400)
        |SELECT p_id, t_id, touch_type, lag_sec FROM j WHERE rk = 1
        |ORDER BY p_id""".stripMargin,

    "e10_gapfill" ->
      """WITH e AS (
        |  SELECT event_type, CAST(floor(floor(epoch(ts)) / 3600) AS BIGINT) AS hr
        |  FROM events WHERE user_id % 100 = 7),
        |b AS (SELECT min(hr) AS h0, max(hr) AS h1 FROM e),
        |g AS (
        |  SELECT t.event_type, u.hr
        |  FROM (SELECT DISTINCT event_type FROM e) t, b,
        |       LATERAL (SELECT unnest(generate_series(b.h0, b.h1)) AS hr) u),
        |o AS (SELECT event_type, hr, count(*) AS cnt FROM e GROUP BY 1, 2),
        |d AS (
        |  SELECT g.event_type, g.hr, coalesce(o.cnt, 0) AS cnt
        |  FROM g LEFT JOIN o ON g.event_type = o.event_type AND g.hr = o.hr),
        |r AS (
        |  SELECT event_type, hr, cnt,
        |    sum(CASE WHEN cnt > 0 THEN 1 ELSE 0 END) OVER (
        |      PARTITION BY event_type ORDER BY hr ROWS UNBOUNDED PRECEDING) AS grp
        |  FROM d),
        |z AS (
        |  SELECT event_type, max(run) AS max_zero_run FROM (
        |    SELECT event_type, grp, count(*) AS run FROM r WHERE cnt = 0 GROUP BY 1, 2)
        |  GROUP BY event_type),
        |s AS (
        |  SELECT event_type, count(*) AS n_hours,
        |    CAST(sum(CASE WHEN cnt = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_empty,
        |    CAST(sum(cnt) AS BIGINT) AS n_events
        |  FROM d GROUP BY event_type)
        |SELECT s.event_type, s.n_hours, s.n_empty,
        |  CAST(coalesce(z.max_zero_run, 0) AS BIGINT) AS max_zero_run, s.n_events
        |FROM s LEFT JOIN z ON s.event_type = z.event_type
        |ORDER BY s.event_type""".stripMargin
  )
}
