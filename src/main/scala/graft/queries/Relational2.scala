package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Second relational pack: the rest of the SURVEY §2 gap-analysis surface
  * (cube, correlated subqueries, string functions, scalar subqueries) plus
  * a skew-handling demonstration — a salted aggregation proven
  * value-identical to its unsalted oracle.
  */
object Relational2 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // --- sequence packing (GPT-style concat-and-chunk): assign every doc
    //     a global token start-offset, then pack_id = start / 4096. The
    //     prefix sum is two-phase so NO stage ever sees a single-partition
    //     window over the corpus: (1) an in-bucket prefix window keyed by
    //     doc_id range-bucket, (2) a bucket-totals cumsum over a table
    //     500x smaller than the corpus, broadcast back. At 100 TB the
    //     bucket-totals pass recurses (bucket the buckets) — each level
    //     shrinks 500x, so 3 levels cover 10^8 buckets; here one level
    //     suffices and the totals window is a few thousand rows. ---
    "p7_pack" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ctx = 4096L
      val bucketSz = 500L
      val toks = t(s, dir, "documents")
        .select(col("doc_id"),
          graft.functions.token_count(col("text")).cast("long").as("n_tok"),
          expr(s"doc_id div $bucketSz").as("bucket"))
      val inBucket = toks.withColumn("local_pre",
        coalesce(sum(col("n_tok")).over(
          Window.partitionBy(col("bucket")).orderBy(col("doc_id"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      val bucketTotals = toks.groupBy(col("bucket"))
        .agg(sum(col("n_tok")).as("btot"))
        .withColumn("boff",
          coalesce(sum(col("btot")).over(
            Window.orderBy(col("bucket"))
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select(col("bucket"), col("boff"))
      inBucket.join(broadcast(bucketTotals), Seq("bucket"))
        .select(col("doc_id"), col("n_tok"),
          expr(s"(boff + local_pre) div $ctx").as("pack_id"))
        .groupBy(col("pack_id"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).cast("long").as("pack_tokens"),
          min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
        .orderBy(col("pack_id"))
    }),

    // --- weighted sampling without replacement (Efraimidis-Spirakis
    //     A-ES): key = ln(u) / w with u a deterministic md5-derived
    //     uniform in (0,1] and w = n_chars; the k largest keys are the
    //     sample, giving inclusion probability proportional to weight —
    //     the "sample big documents proportionally" pass of corpus
    //     curation, reproducible across engines because u comes from
    //     md5(doc_id), not an RNG. The top-k is TakeOrderedAndProject
    //     (per-partition partial top-k, tiny driver merge) so no global
    //     sort ever happens; keys are rounded to 6 decimals before
    //     ranking so the float ln() sits far from any compare. ---
    "p8_weighted_sample" -> ((s, dir) => {
      val k = 50
      t(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("n_chars"),
          expr("round(ln((md5_bits(CAST(doc_id AS STRING), 8) + 1)" +
            " / 4294967296.0) * 1000000 / n_chars, 6)").as("sk"))
        .orderBy(col("sk").desc, col("doc_id")).limit(k)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_sampled"),
          sum(col("n_chars")).cast("long").as("sampled_chars"))
        .orderBy(col("source"))
    }),

    // --- TPC-H Q6-style: pure filter + agg, pushdown showcase ---
    "q6_filter_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_discount").between(0.02, 0.06) && col("l_quantity") < 24)
        .agg(round(sum(col("l_extendedprice") * col("l_discount")), 4).as("revenue"),
          count(lit(1)).as("n"))
    }),

    // --- CUBE over two dims ---
    "cube_agg" -> ((s, dir) => {
      t(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 4).as("total"))
        .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)
    }),

    // --- correlated EXISTS subquery (decorrelates to semi join) ---
    "sub_exists" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT c_custkey, c_acctbal
          |FROM customer
          |WHERE EXISTS (SELECT 1 FROM orders
          |              WHERE o_custkey = c_custkey AND o_totalprice > 200000)
          |ORDER BY c_custkey""".stripMargin)
    }),

    // --- scalar subquery in projection ---
    "sub_scalar" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT n_name,
          |  (SELECT count(*) FROM customer WHERE c_nationkey = n_nationkey) AS n_cust,
          |  (SELECT round(coalesce(avg(c_acctbal), 0), 4) FROM customer
          |   WHERE c_nationkey = n_nationkey) AS avg_bal
          |FROM nation ORDER BY n_name""".stripMargin)
    }),

    // --- string-function pack over part names ---
    "str_funcs" -> ((s, dir) => {
      t(s, dir, "part")
        .select(col("p_partkey"),
          upper(substring(col("p_name"), 1, 8)).as("pfx"),
          length(col("p_name")).as("len"),
          regexp_replace(col("p_name"), "[aeiou]", "_").as("devowel"),
          concat_ws("|", col("p_brand"), col("p_type")).as("tag"),
          lpad(col("p_partkey").cast("string"), 8, "0").as("padded"))
        .filter(col("p_partkey") < 200)
        .orderBy(col("p_partkey"))
    }),

    // --- skew handling: salted two-phase aggregation, value-identical to
    //     the plain group-by (the oracle). Phase 1 aggregates on
    //     (key, salt) spreading any hot key over 16 reducers; phase 2
    //     merges partials. sum/count compose exactly. ---
    "skew_salted_agg" -> ((s, dir) => {
      val salted = t(s, dir, "lineitem")
        .withColumn("salt", pmod(col("l_orderkey") * 2654435761L + col("l_linenumber"), lit(16)))
        .groupBy(col("l_returnflag"), col("salt"))
        .agg(sum(col("l_quantity")).as("part_sum"), count(lit(1)).as("part_n"))
      salted.groupBy(col("l_returnflag"))
        .agg(round(sum(col("part_sum")), 4).as("sum_qty"),
          sum(col("part_n")).cast("long").as("n"))
        .orderBy(col("l_returnflag"))
    }),

    // --- window frames: running, sliding, and lead/lag over order dates ---
    "w2_frames" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val o = t(s, dir, "orders").filter(col("o_custkey") < 30)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
      o.select(col("o_custkey"), col("o_orderkey"),
          round(sum(col("o_totalprice")).over(
            w.rowsBetween(Window.unboundedPreceding, 0)), 4).as("running_total"),
          round(avg(col("o_totalprice")).over(
            w.rowsBetween(-1, 1)), 4).as("sliding_avg3"),
          round(lag(col("o_totalprice"), 1).over(w), 4).as("prev_price"),
          round(lead(col("o_totalprice"), 1).over(w), 4).as("next_price"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // --- value-based RANGE window frames (the frame kind w2's ROWS
    //     frames don't cover): per event type, count and scaled-integer
    //     sum of values in the trailing 10 minutes BY TIMESTAMP VALUE.
    //     RANGE frames are tie-safe by construction (the frame is defined
    //     by value bounds, so peer ordering can't change the result), and
    //     the 1e3-scaled BIGINT value sum is addition-order-independent —
    //     together the window is deterministic at any parallelism. One
    //     exchange keyed by event_type. ---
    "w5_range_frame" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("event_type")).orderBy(col("sec"))
        .rangeBetween(-600, 0)
      t(s, dir, "events")
        .select(col("event_id"), col("event_type"),
          unix_timestamp(col("ts")).as("sec"),
          expr("CAST(floor(value * 1000 + 0.5) AS BIGINT)").as("mv"))
        .withColumn("n_10min", count(lit(1)).over(w))
        .withColumn("sum_mv", sum(col("mv")).over(w))
        .filter(col("event_id") < 2000)
        .select(col("event_id"), col("event_type"), col("n_10min"), col("sum_mv"))
        .orderBy(col("event_id"))
    }),

    // --- distribution windows (the w-family kinds not yet covered):
    //     ntile quartiles + cume_dist + percent_rank over account
    //     balance within market segment, rolled up per (segment, tile).
    //     The ORDER BY carries the unique custkey tiebreak, so every
    //     fraction is deterministic under ties; the rollup keeps only
    //     order-invariant stats (count, min/max, and the cume_dist/
    //     pct_rank extrema, which are exact rationals). One exchange
    //     keyed by segment. ---
    "w6_ntile_cume" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal"), col("c_custkey"))
      t(s, dir, "customer")
        .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"))
        .withColumn("tile", ntile(4).over(w))
        .withColumn("cd", cume_dist().over(w))
        .withColumn("pr", percent_rank().over(w))
        .groupBy(col("c_mktsegment"), col("tile"))
        .agg(count(lit(1)).as("n"),
          round(min(col("c_acctbal")), 4).as("bal_min"),
          round(max(col("c_acctbal")), 4).as("bal_max"),
          round(max(col("cd")), 6).as("cd_max"),
          round(min(col("pr")), 6).as("pr_min"))
        .orderBy(col("c_mktsegment"), col("tile"))
    }),

    // --- pivot (Spark .pivot vs CASE-expression oracle) ---
    // --- deterministic stratified sampling: md5-hash gating, per-stratum
    //     rates (en 50% / de 20% / else 10%). The reproducible-at-scale
    //     sampling form — no RNG state, any engine recomputes the same
    //     sample, membership is a map-side filter ---
    "p3_hash_sample" -> ((s, dir) => {
      val bucket = expr("md5_bits(CAST(doc_id AS STRING), 4) % 100")
      val rate = when(col("lang") === "en", 50).when(col("lang") === "de", 20).otherwise(10)
      Tables.load(s, dir, "documents")
        .filter(bucket < rate)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_sampled"), sum(col("n_chars")).cast("long").as("sampled_chars"))
        .orderBy(col("lang"))
    }),

    "p2_pivot" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .pivot(col("o_orderstatus"), Seq("F", "O", "P"))
        .agg(round(sum(col("o_totalprice")), 4))
        .toDF("o_orderpriority", "total_f", "total_o", "total_p")
        .orderBy(col("o_orderpriority"))
    }),

    // --- explicit GROUPING SETS (the general form cube/rollup special-
    //     case): one Expand + one hash aggregate, no extra shuffle per set ---
    "q4_grouping_sets" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT o_orderpriority, o_orderstatus, count(*) AS n,
          |  round(sum(o_totalprice), 2) AS total
          |FROM orders
          |GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus), (o_orderpriority), ())
          |ORDER BY o_orderpriority ASC NULLS FIRST, o_orderstatus ASC NULLS FIRST""".stripMargin)
    }),

    // --- lag/lead/ntile window pack over each customer's order history ---
    "w3_lag_lead" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, dir, "orders").filter(col("o_custkey") < 100)
        .select(col("o_custkey"), col("o_orderkey"),
          lag(col("o_orderkey"), 1).over(w).as("prev_key"),
          lead(col("o_orderkey"), 1).over(w).as("next_key"),
          round(col("o_totalprice") - lag(col("o_totalprice"), 1).over(w), 4).as("delta_prev"),
          ntile(4).over(w).as("quartile"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // --- TPC-H Q7 shape: nation-pair trade volume by ship year. Five
    //     joins; both nation dims broadcast, the (supp, cust) name pair
    //     filter prunes before the aggregate ---
    "q7_nation_trade" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
          |  year(l_shipdate) AS l_year,
          |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
          |FROM supplier, lineitem, orders, customer, nation n1, nation n2
          |WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
          |  AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
          |  AND c_nationkey = n2.n_nationkey
          |  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          |GROUP BY 1, 2, 3
          |ORDER BY supp_nation, cust_nation, l_year""".stripMargin)
    }),

    // --- fixed-width histogram over prices: width_bucket on the Spark
    //     side, the equivalent floor arithmetic in the oracle. The two
    //     formulas agree only INSIDE [0, 110000) (width_bucket clamps
    //     out-of-range values to buckets 0 / num+1, floor does not), so
    //     both sides restrict to that domain explicitly rather than
    //     relying on the current data's range ---
    "a4_histogram" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_extendedprice") >= 0 && col("l_extendedprice") < 110000)
        .select(expr("width_bucket(l_extendedprice, 0, 110000, 11)").as("bucket"),
          col("l_extendedprice"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"), round(avg(col("l_extendedprice")), 4).as("avg_price"))
        .orderBy(col("bucket"))
    }),

    // --- statistical aggregates: correlation / covariance / stddev ---
    "a5_corr_covar" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qp"),
          round(covar_samp(col("l_quantity"), col("l_extendedprice")), 4).as("covar_qp"),
          round(stddev_samp(col("l_extendedprice")), 4).as("sd_price"))
        .orderBy(col("l_returnflag"))
    }),

    // --- custom typed-Aggregator UDAF under the gate: geometric mean of
    //     prices per flag (log-sum partials -> two-phase aggregate) ---
    "a6_gmean" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(expr("round(gmean(l_extendedprice), 4)").as("gm_price"),
          round(avg(col("l_extendedprice")), 4).as("am_price"))
        .orderBy(col("l_returnflag"))
    }),

    // --- unpivot (melt): the wide-to-long reshape a feature store needs
    //     going into per-metric pipelines — Spark's `stack` generator
    //     (codegen'd, map-side: the reshape itself is shuffle-free; only
    //     the upstream aggregate exchanges) vs a UNION ALL oracle. ---
    "p6_unpivot" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(round(sum(col("l_quantity")), 4).as("qty"),
          round(sum(col("l_extendedprice")), 4).as("price"),
          round(sum(col("l_discount")), 4).as("disc"))
        .selectExpr("l_returnflag",
          "stack(3, 'qty', qty, 'price', price, 'disc', disc) AS (metric, val)")
        .orderBy(col("l_returnflag"), col("metric"))
    }),

    // --- referential-integrity audit: orphan counts across every
    //     foreign-key edge of the star schema, the data-quality sweep a
    //     warehouse load runs before trusting joins. Each check is one
    //     left-anti join on the key (Catalyst's NOT EXISTS shape — one
    //     shuffle of the child's keys against the parent, no per-row
    //     probe); the five audits union into a single report. On healthy
    //     data every count is 0, which is exactly the assertion — and
    //     total row counts ride along so the gate is not vacuous. ---
    "a8_ref_audit" -> ((s, dir) => {
      def audit(name: String, child: DataFrame, key: String,
          parent: DataFrame, pkey: String): DataFrame = {
        val orphans = child.join(parent.select(col(pkey)),
          child(key) === col(pkey), "left_anti")
        child.agg(count(lit(1)).as("n_rows"))
          .crossJoin(orphans.agg(count(lit(1)).as("n_orphans")))
          .select(lit(name).as("fk_edge"), col("n_rows"), col("n_orphans"))
      }
      Seq(
        audit("lineitem.orderkey->orders", t(s, dir, "lineitem"), "l_orderkey",
          t(s, dir, "orders"), "o_orderkey"),
        audit("lineitem.partkey->part", t(s, dir, "lineitem"), "l_partkey",
          t(s, dir, "part"), "p_partkey"),
        audit("orders.custkey->customer", t(s, dir, "orders"), "o_custkey",
          t(s, dir, "customer"), "c_custkey"),
        audit("customer.nationkey->nation", t(s, dir, "customer"), "c_nationkey",
          t(s, dir, "nation"), "n_nationkey"),
        audit("supplier.nationkey->nation", t(s, dir, "supplier"), "s_nationkey",
          t(s, dir, "nation"), "n_nationkey")
      ).reduce(_ unionAll _).orderBy(col("fk_edge"))
    }),

    // --- column profiling (the ANALYZE-style sweep a warehouse runs on
    //     ingest): per column, null count, exact distinct count, and
    //     min/max — numeric columns report rounded doubles, string
    //     columns lexicographic bounds, the date column epoch seconds.
    //     One branch per column, each a SINGLE-COLUMN parquet scan
    //     (pushdown prunes to exactly that column — columnar IO reads
    //     the same bytes as one 6-column pass) feeding a two-phase
    //     distinct aggregate. Measured against the tempting alternative:
    //     folding all six profiles into ONE aggregate plans a 7-way
    //     Expand of the full-width rows through a multi-distinct hash
    //     aggregate — 8.6 s vs 0.9 s at sf0.1. At 100 TB the exact
    //     distincts downgrade to approx_count_distinct (approx_stats is
    //     the audited twin); the branch shape is unchanged. ---
    "a9_profile" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      def num(c: String): DataFrame =
        li.select(col(c)).agg(
          sum(col(c).isNull.cast("int")).cast("long").as("n_nulls"),
          countDistinct(col(c)).as("n_distinct"),
          round(min(col(c)), 4).as("vmin"), round(max(col(c)), 4).as("vmax"))
        .select(lit(c).as("column_name"), col("n_nulls"), col("n_distinct"),
          col("vmin"), col("vmax"),
          lit(null).cast("string").as("smin"), lit(null).cast("string").as("smax"))
      def str(c: String): DataFrame =
        li.select(col(c)).agg(
          sum(col(c).isNull.cast("int")).cast("long").as("n_nulls"),
          countDistinct(col(c)).as("n_distinct"),
          min(col(c)).as("smin"), max(col(c)).as("smax"))
        .select(lit(c).as("column_name"), col("n_nulls"), col("n_distinct"),
          lit(null).cast("double").as("vmin"), lit(null).cast("double").as("vmax"),
          col("smin"), col("smax"))
      def ts(c: String): DataFrame =
        li.select(col(c)).agg(
          sum(col(c).isNull.cast("int")).cast("long").as("n_nulls"),
          countDistinct(col(c)).as("n_distinct"),
          unix_timestamp(min(col(c))).cast("double").as("vmin"),
          unix_timestamp(max(col(c))).cast("double").as("vmax"))
        .select(lit(c).as("column_name"), col("n_nulls"), col("n_distinct"),
          col("vmin"), col("vmax"),
          lit(null).cast("string").as("smin"), lit(null).cast("string").as("smax"))
      Seq(num("l_quantity"), num("l_extendedprice"), num("l_discount"),
          str("l_returnflag"), str("l_linestatus"), ts("l_shipdate"))
        .reduce(_ union _)
        .orderBy(col("column_name"))
    }),

    // --- distribution-drift detection (PSI, the population stability
    //     index a feature store monitors between training and serving
    //     windows): order-value distribution 1996 vs 1997 in 10 fixed
    //     50k buckets, Laplace-smoothed proportions so empty buckets
    //     stay defined, per-bucket contribution (p-q)*ln(p/q). Each
    //     contribution quantizes to integer micro-units BEFORE the
    //     total sums (e20's discipline), so the one float total is an
    //     exact-integer sum; ln sees ratios of exact counts. Shape: one
    //     scan, one 10-group hash aggregate, a broadcast total, and a
    //     10-row spine join — nothing bigger than the bucket relation
    //     after the first aggregate. ---
    "a10_psi_drift" -> ((s, dir) => {
      val o = t(s, dir, "orders")
        .select(year(col("o_orderdate")).as("y"), col("o_totalprice"))
        .filter(col("y").isin(1996, 1997))
        .select(col("y"),
          least(floor(col("o_totalprice") / 50000).cast("long"), lit(9L)).as("bucket"))
      val cnt = o.groupBy(col("bucket"))
        .agg(sum(when(col("y") === 1996, 1).otherwise(0)).cast("long").as("n_a"),
          sum(when(col("y") === 1997, 1).otherwise(0)).cast("long").as("n_b"))
      val spine = s.range(10).select(col("id").cast("long").as("bucket"))
      val tot = cnt.agg(sum(col("n_a")).cast("long").as("ta"),
        sum(col("n_b")).cast("long").as("tb"))
      val terms = spine.join(cnt, Seq("bucket"), "left")
        .select(col("bucket"),
          coalesce(col("n_a"), lit(0L)).as("n_a"),
          coalesce(col("n_b"), lit(0L)).as("n_b"))
        .crossJoin(broadcast(tot))
        .select(col("bucket"), col("n_a"), col("n_b"),
          ((col("n_a") + 1) / (col("ta") + 10)).as("pa"),
          ((col("n_b") + 1) / (col("tb") + 10)).as("pb"))
        .select(col("bucket"), col("n_a"), col("n_b"),
          floor((col("pa") - col("pb")) * log(col("pa") / col("pb")) * 1e6 + 0.5)
            .cast("long").as("t6"))
      terms.select(col("bucket"), col("n_a"), col("n_b"),
          round(col("t6") / 1e6, 6).as("psi_term"))
        .union(terms.agg(lit(-1L).as("bucket"),
          sum(col("n_a")).cast("long").as("n_a"),
          sum(col("n_b")).cast("long").as("n_b"),
          round(sum(col("t6")) / 1e6, 6).as("psi_term")))
        .orderBy(col("bucket"))
    }),

    // --- seasonal index decomposition — the BI seasonality report
    //     (which months run hot?): per calendar month across all years,
    //     order volume and value vs the all-time baseline. The index is
    //     month_avg / overall_avg in ppm with BOTH averages exact floor
    //     divisions of integer-cent sums — the division order is pinned
    //     (avg first, then ratio) so both engines walk identical
    //     integers; no float mean ever forms. One 12-group hash
    //     aggregate + a broadcast one-row baseline. ---
    "a14_seasonality" -> ((s, dir) => {
      val o = t(s, dir, "orders").select(
        month(col("o_orderdate")).as("m"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("cents"))
      val byM = o.groupBy(col("m"))
        .agg(count(lit(1)).as("n_orders"), sum(col("cents")).cast("long").as("sum_cents"))
      val base = byM.agg(
        expr("sum(sum_cents) div sum(n_orders)").as("avg_all"))
      byM.crossJoin(broadcast(base))
        .select(col("m"), col("n_orders"), col("sum_cents"),
          expr("(sum_cents div n_orders) * 1000000 div avg_all").as("idx_ppm"))
        .orderBy(col("m"))
    }),

    // --- functional-dependency audit — schema-discovery profiling (the
    //     normalization/data-contract check): does X determine Y? Each
    //     candidate FD is ONE two-level distinct aggregate (partial by
    //     (lhs, rhs), then count-distinct per lhs — all map-side
    //     combinable); a key violates when it maps to >1 distinct rhs.
    //     The suite mixes one FD that HOLDS (l_orderkey -> o_custkey
    //     through the FK join — the referential contract) with three
    //     that fail at different rates, so the gate checks both
    //     directions of the verdict. Violation rate is exact integer
    //     ppm. At 100 TB each FD is an independent aggregate over its
    //     own pruned column pair — no shared scan forces a wide row. ---
    "a13_fd_audit" -> ((s, dir) => {
      def audit(name: String, rel: DataFrame, lhs: String, rhs: String): DataFrame =
        rel.groupBy(col(lhs)).agg(countDistinct(col(rhs)).as("nd"))
          .agg(count(lit(1)).as("n_keys"),
            sum(when(col("nd") > 1, 1L).otherwise(0L)).cast("long").as("n_violating"),
            max(col("nd")).as("max_rhs"))
          .select(lit(name).as("fd"), col("n_keys"), col("n_violating"),
            expr("n_violating * 1000000 div n_keys").as("viol_ppm"), col("max_rhs"))
      val li = t(s, dir, "lineitem")
      val joined = li.select(col("l_orderkey"))
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      audit("l_orderkey->o_custkey", joined, "l_orderkey", "o_custkey")
        .unionByName(audit("l_orderkey->l_linestatus", li, "l_orderkey", "l_linestatus"))
        .unionByName(audit("l_partkey->l_suppkey", li, "l_partkey", "l_suppkey"))
        .unionByName(audit("o_custkey->o_orderpriority", t(s, dir, "orders"),
          "o_custkey", "o_orderpriority"))
        .orderBy(col("fd"))
    }),

    // --- incremental view maintenance — the materialized-aggregate
    //     refresh path: the standing view (shipments before 1998) and
    //     the day's delta (1998 onward) are aggregated SEPARATELY and
    //     merged by summing partials — sum/count/min/max are all
    //     decomposable, so the merge touches only (group, partial)
    //     rows, never the 100 TB base scan a full refresh would pay.
    //     The audit column recomputes the aggregate from the full scan
    //     and pins merged == recomputed per group (exact integers: qty
    //     is quantized to cents before summing), so the gate
    //     value-checks the IVM algebra itself, not just the shapes. ---
    "a12_ivm" -> ((s, dir) => {
      def part(f: DataFrame): DataFrame = f
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(expr("CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)")).cast("long").as("qty_c"),
          count(lit(1)).as("n"),
          min(col("l_shipdate")).as("first_ship"),
          max(col("l_shipdate")).as("last_ship"))
      val li = t(s, dir, "lineitem")
      val cut = lit("1998-01-01").cast("timestamp")
      val base = part(li.filter(col("l_shipdate") < cut))
      val delta = part(li.filter(col("l_shipdate") >= cut))
      val merged = base.unionByName(delta)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("qty_c")).cast("long").as("qty_c"),
          sum(col("n")).cast("long").as("n"),
          min(col("first_ship")).as("first_ship"),
          max(col("last_ship")).as("last_ship"))
      val full = part(li)
        .select(col("l_returnflag"), col("l_linestatus"),
          col("qty_c").as("f_qty"), col("n").as("f_n"))
      merged.join(full, Seq("l_returnflag", "l_linestatus"))
        .select(col("l_returnflag"), col("l_linestatus"), col("qty_c"), col("n"),
          col("first_ship"), col("last_ship"),
          (col("qty_c") === col("f_qty") && col("n") === col("f_n")).as("ivm_exact"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // --- Benford first-digit audit — the forensic data-quality check
    //     (fabricated or truncated monetary data deviates from
    //     log10(1+1/d)): leading digit taken from the DECIMAL STRING of
    //     exact integer cents (never from float log10 of the value, so
    //     no boundary can flip a digit), counted in one 9-group hash
    //     aggregate. Observed shares are exact integer ppm
    //     (n*1e6 div total); the Benford expectation quantizes to ppm
    //     via floor(x*1e6+0.5) — e20's discipline — with every
    //     expectation ≥ 9.4e-3 away from a rounding boundary, so the
    //     one float (log10) can't drift across engines. Scale: a
    //     full-corpus scan into 9 groups, then arithmetic on a 9-row
    //     relation with a broadcast total. ---
    "a11_benford" -> ((s, dir) => {
      val d = t(s, dir, "orders").select(
        substring(expr("CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS STRING)"), 1, 1)
          .cast("int").as("digit"))
      val g = d.groupBy(col("digit")).agg(count(lit(1)).as("n"))
      val tot = g.agg(sum(col("n")).cast("long").as("total"))
      g.crossJoin(broadcast(tot))
        .select(col("digit"), col("n"),
          expr("n * 1000000 div total").as("obs_ppm"),
          expr("CAST(floor(log10(1 + 1.0 / digit) * 1e6 + 0.5) AS BIGINT)").as("exp_ppm"))
        .withColumn("dev_ppm", col("obs_ppm") - col("exp_ppm"))
        .orderBy(col("digit"))
    }),

    // --- exact per-group percentiles: Spark's `percentile` (exact,
    //     sort-based with linear interpolation) vs DuckDB quantile_cont —
    //     the distribution sweep a data-quality report runs per segment.
    //     Exact percentile sorts each group's values; at 100 TB the
    //     approx_percentile sketch (see approx_stats) is the scale path
    //     and this is the auditor that validates it on samples. ---
    "a7_percentiles" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(round(expr("percentile(l_quantity, 0.25D)"), 4).as("q25"),
          round(expr("percentile(l_quantity, 0.5D)"), 4).as("q50"),
          round(expr("percentile(l_quantity, 0.75D)"), 4).as("q75"),
          round(expr("percentile(l_extendedprice, 0.95D)"), 4).as("p95"))
        .orderBy(col("l_returnflag"))
    }),

    // --- calendar decomposition: ISO weekday x quarter seasonality
    //     (Spark weekday() is 0=Mon; +1 aligns with DuckDB isodow) ---
    "cal1_date_parts" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(expr("CAST(weekday(o_orderdate) + 1 AS BIGINT)").as("dow"),
          expr("CAST(quarter(o_orderdate) AS BIGINT)").as("qtr"))
        .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 4).as("total"))
        .orderBy(col("dow"), col("qtr"))
    }),

    // --- relative-position window functions: percent_rank + cume_dist ---
    "w4_pct_rank" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_orderpriority")).orderBy(col("o_totalprice"))
      t(s, dir, "orders").filter(col("o_custkey") < 50)
        .select(col("o_orderkey"), col("o_orderpriority"),
          round(percent_rank().over(w), 6).as("pct"),
          round(cume_dist().over(w), 6).as("cd"))
        .orderBy(col("o_orderkey"))
    }),

    // --- approximate stats, value-gated: the raw sketch values
    //     (HyperLogLog++, KLL-style percentile) are engine-specific and
    //     can never hash-match DuckDB, so the gated OUTPUT carries the
    //     exact twins plus TOLERANCE BOOLEANS — |approx - exact| within
    //     the sketch's published error envelope (HLL rsd 0.05 -> 3-sigma
    //     15%; approx_percentile accuracy 10000 -> ~exact at gate scale,
    //     1% relative value slack). The oracle asserts the booleans as
    //     literal TRUE: a sketch drifting out of bound flips the bit and
    //     fails the hash compare, making this a value-level gate instead
    //     of the old rows-only check. SparkEntryContractSpec additionally
    //     asserts the raw |approx - exact| bound directly. ---
    "approx_stats" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("exact_parts"),
          approx_count_distinct(col("l_partkey")).as("ap"),
          expr("percentile(l_extendedprice, 0.5D)").as("ep50"),
          expr("approx_percentile(l_extendedprice, 0.5, 10000)").as("ap50"))
        .select(col("l_returnflag"), col("exact_parts"),
          round(col("ep50"), 4).as("exact_p50"),
          (abs(col("ap") - col("exact_parts")) <= col("exact_parts") * 0.15).as("cd_ok"),
          (abs(col("ap50") - col("ep50")) <= abs(col("ep50")) * 0.01).as("p50_ok"))
        .orderBy(col("l_returnflag"))
    }),

    // --- TPC-H Q13-style: distribution of customers by order count via a
    //     LEFT OUTER join (zero-order customers must survive). Shape: one
    //     shuffle keyed by custkey for the outer join + per-customer
    //     count, then a tiny distribution aggregate. ---
    "q8_custdist" -> ((s, dir) => {
      val c = t(s, dir, "customer").select(col("c_custkey"))
      val o = t(s, dir, "orders")
        .filter(col("o_orderpriority") =!= "1-URGENT")
        .select(col("o_custkey"), col("o_orderkey"))
      c.join(o, col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),

    // --- deterministic stratified train/val/test split: the md5-bucket
    //     assignment every training-data pipeline needs — reproducible
    //     across engines and runs (no RNG), stratified per source purely
    //     map-side; the only shuffle is the final per-(source, split)
    //     rollup. ---
    "p4_split" -> ((s, dir) => {
      t(s, dir, "documents")
        .withColumn("bucket",
          expr("md5_bits(CAST(doc_id AS STRING), 4) % 100"))
        .withColumn("split",
          when(col("bucket") < 80, "train").when(col("bucket") < 90, "val").otherwise("test"))
        .groupBy(col("source"), col("split"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast("long").as("total_chars"))
        .orderBy(col("source"), col("split"))
    }),

    // --- per-source cap (the C4/RefinedWeb domain cap): keep at most 15
    //     docs per source, chosen by deterministic md5 rank so the
    //     selection is reproducible and uniform within a source. At
    //     100 TB a giant domain would skew the rank window; since only
    //     ranks <= K matter, the lever is a partial per-partition top-K
    //     before the per-source window (TakeOrderedAndProject shape),
    //     which bounds any partition's state at K rows per source. ---
    "p5_source_cap" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val k = 15
      val w = Window.partitionBy(col("source"))
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      t(s, dir, "documents")
        .withColumn("rk", row_number().over(w))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("rk") <= k, 1).otherwise(0)).cast("long").as("n_kept"),
          sum(when(col("rk") > k, 1).otherwise(0)).cast("long").as("n_dropped"),
          sum(when(col("rk") <= k, col("n_chars")).otherwise(0L)).cast("long").as("kept_chars"))
        .orderBy(col("source"))
    }),

    // --- training-mixture materialization: per-source sampling rates
    //     (rates > 1 mean epoch UPSAMPLING — extra full copies plus a
    //     fractional md5-coin copy; rates < 1 downsample), realized as
    //     integer-exact acceptance against a 32-bit md5 uniform so the
    //     mixture is reproducible on any engine and any partitioning.
    //     copies = floor(rate) + [u32 < frac(rate) * 2^32], epochs
    //     explode row-locally — the corpus is scanned ONCE, nothing
    //     shuffles until the 20-group source rollup. This is the
    //     "mix sources at configured weights" pass every LLM training
    //     run executes before packing. Rates here derive from the
    //     source id (src%4 -> 1.0 / 0.5 / 0.25 / 1.5); in production
    //     they arrive as a broadcast config table — same dataflow. ---
    "p9_mixture" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val withCopies = d.select(col("source"), col("doc_id"), col("n_chars"),
          expr("CAST(replace(source, 'src', '') AS INT) % 4").as("rq"),
          expr("md5_bits(CAST(doc_id AS STRING), 8)").as("u32"))
        // quarter-unit rates: rq 0 -> 4/4, 1 -> 2/4, 2 -> 1/4, 3 -> 6/4;
        // acceptance threshold in exact integer space (2^30 per quarter)
        .withColumn("rate_q",
          expr("CASE rq WHEN 0 THEN 4 WHEN 1 THEN 2 WHEN 2 THEN 1 ELSE 6 END"))
        .withColumn("copies",
          expr("CAST(rate_q div 4 + CASE WHEN u32 < CAST(rate_q % 4 AS BIGINT) * 1073741824" +
            " THEN 1 ELSE 0 END AS INT)"))
      val out = withCopies
        .select(col("source"), col("n_chars"),
          explode(expr("CASE WHEN copies < 1 THEN array() ELSE sequence(1, copies) END")).as("epoch"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_out"),
          max(col("epoch")).as("epochs"),
          sum(col("n_chars")).cast("long").as("chars_out"))
      d.groupBy(col("source")).agg(count(lit(1)).as("n_in"))
        .join(out, Seq("source"), "left")
        .select(col("source"), col("n_in"),
          coalesce(col("n_out"), lit(0L)).as("n_out"),
          coalesce(col("epochs"), lit(0)).as("epochs"),
          coalesce(col("chars_out"), lit(0L)).as("chars_out"))
        .orderBy(col("source"))
    }),

    // --- temperature-reweighted mixture allocation (the data-mixing
    //     step of multi-source pretraining: upweight small sources, damp
    //     large ones — rates ~ count^T with T = 1/2). Integer sqrt
    //     (floor(sqrt(n))) keeps the whole allocation exact: sqrt of a
    //     Long-exact double is correctly-rounded IEEE in both engines
    //     and floor pins it to a BIGINT weight, so sums and divisions
    //     never see an order-dependent double. The largest-remainder
    //     top-up makes the per-source budget sum to EXACTLY the
    //     requested 100k docs under any partitioning (ties broken by
    //     source name). Scale shape: one per-source aggregate (a few
    //     dozen rows at any corpus size), windows over sources only —
    //     the corpus is scanned once. ---
    "p10_temperature_mix" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val B = 100000L
      val bySrc = t(s, dir, "documents").groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"))
        .withColumn("w", expr("CAST(floor(sqrt(CAST(n_docs AS DOUBLE))) AS BIGINT)"))
      val tot = bySrc.groupBy().agg(sum(col("w")).cast("long").as("tw"))
      val base = bySrc.crossJoin(broadcast(tot))
        .withColumn("alloc0", expr(s"($B * w) div tw"))
        .withColumn("rem", expr(s"$B * w - (($B * w) div tw) * tw"))
      val sumA = base.groupBy().agg(sum(col("alloc0")).cast("long").as("sa"))
      val wr = Window.orderBy(col("rem").desc, col("source"))
      base.crossJoin(broadcast(sumA))
        .withColumn("rk", row_number().over(wr))
        .select(col("source"), col("n_docs"), col("w"),
          (col("alloc0") +
            when(col("rk") <= lit(B) - col("sa"), 1L).otherwise(0L)).as("alloc"))
        .orderBy(col("source"))
    })
  )

  val oracles: Map[String, String] = Map(
    "w5_range_frame" ->
      """WITH e AS (
        |  SELECT event_id, event_type,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS sec,
        |    CAST(floor(value * 1000 + 0.5) AS BIGINT) AS mv
        |  FROM events),
        |x AS (
        |  SELECT event_id, event_type,
        |    count(*) OVER win AS n_10min,
        |    CAST(sum(mv) OVER win AS BIGINT) AS sum_mv
        |  FROM e
        |  WINDOW win AS (PARTITION BY event_type ORDER BY sec
        |                 RANGE BETWEEN 600 PRECEDING AND CURRENT ROW))
        |SELECT event_id, event_type, n_10min, sum_mv
        |FROM x WHERE event_id < 2000 ORDER BY event_id""".stripMargin,

    // same unique-tiebreak ORDER BY, so ntile/cume_dist/percent_rank
    // agree exactly; both engines assign ntile remainders to low tiles
    "w6_ntile_cume" ->
      """WITH x AS (
        |  SELECT c_mktsegment, c_acctbal,
        |    ntile(4) OVER win AS tile,
        |    cume_dist() OVER win AS cd,
        |    percent_rank() OVER win AS pr
        |  FROM customer
        |  WINDOW win AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey))
        |SELECT c_mktsegment, tile, count(*) AS n,
        |  round(min(c_acctbal), 4) AS bal_min,
        |  round(max(c_acctbal), 4) AS bal_max,
        |  round(max(cd), 6) AS cd_max,
        |  round(min(pr), 6) AS pr_min
        |FROM x GROUP BY 1, 2 ORDER BY c_mktsegment, tile""".stripMargin,

    "p9_mixture" ->
      """WITH b AS (
        |  SELECT source, doc_id, n_chars,
        |    CASE CAST(replace(source, 'src', '') AS INTEGER) % 4
        |      WHEN 0 THEN 4 WHEN 1 THEN 2 WHEN 2 THEN 1 ELSE 6 END AS rate_q,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS u32
        |  FROM documents),
        |c AS (
        |  SELECT source, n_chars,
        |    rate_q // 4 + CASE WHEN u32 < CAST(rate_q % 4 AS BIGINT) * 1073741824
        |      THEN 1 ELSE 0 END AS copies
        |  FROM b),
        |x AS (
        |  SELECT source, n_chars, CAST(u.epoch AS INTEGER) AS epoch
        |  FROM c, LATERAL (SELECT unnest(generate_series(1, copies)) AS epoch) u),
        |o AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_out,
        |    max(epoch) AS epochs, CAST(sum(n_chars) AS BIGINT) AS chars_out
        |  FROM x GROUP BY source)
        |SELECT i.source, i.n_in, COALESCE(o.n_out, 0) AS n_out,
        |  COALESCE(o.epochs, 0) AS epochs, COALESCE(o.chars_out, 0) AS chars_out
        |FROM (SELECT source, CAST(count(*) AS BIGINT) AS n_in
        |      FROM documents GROUP BY source) i
        |LEFT JOIN o ON i.source = o.source
        |ORDER BY i.source""".stripMargin,

    "p10_temperature_mix" ->
      """WITH s AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs
        |  FROM documents GROUP BY source),
        |w AS (
        |  SELECT source, n_docs,
        |    CAST(floor(sqrt(CAST(n_docs AS DOUBLE))) AS BIGINT) AS w
        |  FROM s),
        |t AS (SELECT CAST(sum(w) AS BIGINT) AS tw FROM w),
        |b AS (
        |  SELECT source, n_docs, w, (100000 * w) // tw AS alloc0,
        |    100000 * w - ((100000 * w) // tw) * tw AS rem
        |  FROM w CROSS JOIN t),
        |sa AS (SELECT CAST(sum(alloc0) AS BIGINT) AS sa FROM b),
        |r AS (
        |  SELECT b.*, row_number() OVER (ORDER BY rem DESC, source) AS rk
        |  FROM b)
        |SELECT source, n_docs, w,
        |  CAST(alloc0 + CASE WHEN rk <= 100000 - sa THEN 1 ELSE 0 END AS BIGINT) AS alloc
        |FROM r CROSS JOIN sa ORDER BY source""".stripMargin,

    "p8_weighted_sample" ->
      """WITH keyed AS (
        |  SELECT doc_id, source, n_chars,
        |    round(ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT + 1)
        |      / 4294967296.0) * 1000000 / n_chars, 6) AS sk
        |  FROM documents),
        |top AS (SELECT * FROM keyed ORDER BY sk DESC, doc_id LIMIT 50)
        |SELECT source, count(*) AS n_sampled,
        |  CAST(sum(n_chars) AS BIGINT) AS sampled_chars
        |FROM top GROUP BY source ORDER BY source""".stripMargin,

    "p7_pack" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tok
        |  FROM documents),
        |pre AS (
        |  SELECT doc_id, n_tok,
        |    COALESCE(sum(n_tok) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start
        |  FROM toks)
        |SELECT CAST(start // 4096 AS BIGINT) AS pack_id, count(*) AS n_docs,
        |  CAST(sum(n_tok) AS BIGINT) AS pack_tokens,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM pre GROUP BY 1 ORDER BY pack_id""".stripMargin,

    "q8_custdist" ->
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority != '1-URGENT'
        |  GROUP BY c_custkey)
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "p4_split" ->
      """WITH b AS (
        |  SELECT source, n_chars,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 100 AS bucket
        |  FROM documents)
        |SELECT source,
        |  CASE WHEN bucket < 80 THEN 'train'
        |       WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
        |  count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM b GROUP BY 1, 2 ORDER BY source, split""".stripMargin,

    "p5_source_cap" ->
      """WITH r AS (
        |  SELECT source, n_chars,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        |  FROM documents)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN rk <= 15 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  CAST(sum(CASE WHEN rk > 15 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
        |  CAST(sum(CASE WHEN rk <= 15 THEN n_chars ELSE 0 END) AS BIGINT) AS kept_chars
        |FROM r GROUP BY source ORDER BY source""".stripMargin,

    "q6_filter_agg" ->
      """SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue, count(*) AS n
        |FROM lineitem
        |WHERE l_discount BETWEEN 0.02 AND 0.06 AND l_quantity < 24""".stripMargin,

    "cube_agg" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  round(sum(o_totalprice), 4) AS total
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,

    "q4_grouping_sets" ->
      """SELECT o_orderpriority, o_orderstatus, count(*) AS n,
        |  round(sum(o_totalprice), 2) AS total
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus), (o_orderpriority), ())
        |ORDER BY o_orderpriority ASC NULLS FIRST, o_orderstatus ASC NULLS FIRST""".stripMargin,

    "w3_lag_lead" ->
      """SELECT o_custkey, o_orderkey,
        |  lag(o_orderkey, 1) OVER w AS prev_key,
        |  lead(o_orderkey, 1) OVER w AS next_key,
        |  round(o_totalprice - lag(o_totalprice, 1) OVER w, 4) AS delta_prev,
        |  ntile(4) OVER w AS quartile
        |FROM orders WHERE o_custkey < 100
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q7_nation_trade" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  year(l_shipdate) AS l_year,
        |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
        |FROM supplier, lineitem, orders, customer, nation n1, nation n2
        |WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
        |  AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
        |  AND c_nationkey = n2.n_nationkey
        |  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |GROUP BY 1, 2, 3
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,

    "a4_histogram" ->
      """SELECT CAST(floor(l_extendedprice / 10000) AS BIGINT) + 1 AS bucket,
        |  count(*) AS n, round(avg(l_extendedprice), 4) AS avg_price
        |FROM lineitem
        |WHERE l_extendedprice >= 0 AND l_extendedprice < 110000
        |GROUP BY 1 ORDER BY bucket""".stripMargin,

    "a5_corr_covar" ->
      """SELECT l_returnflag,
        |  round(corr(l_quantity, l_extendedprice), 4) AS corr_qp,
        |  round(covar_samp(l_quantity, l_extendedprice), 4) AS covar_qp,
        |  round(stddev_samp(l_extendedprice), 4) AS sd_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "a6_gmean" ->
      """SELECT l_returnflag,
        |  round(exp(avg(ln(l_extendedprice))), 4) AS gm_price,
        |  round(avg(l_extendedprice), 4) AS am_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "p6_unpivot" ->
      """WITH a AS (
        |  SELECT l_returnflag, round(sum(l_quantity), 4) AS qty,
        |    round(sum(l_extendedprice), 4) AS price,
        |    round(sum(l_discount), 4) AS disc
        |  FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, metric, val FROM (
        |  SELECT l_returnflag, 'qty' AS metric, qty AS val FROM a
        |  UNION ALL SELECT l_returnflag, 'price', price FROM a
        |  UNION ALL SELECT l_returnflag, 'disc', disc FROM a)
        |ORDER BY l_returnflag, metric""".stripMargin,

    "a8_ref_audit" ->
      """SELECT * FROM (
        |  SELECT 'lineitem.orderkey->orders' AS fk_edge,
        |    (SELECT count(*) FROM lineitem) AS n_rows,
        |    (SELECT count(*) FROM lineitem WHERE NOT EXISTS
        |      (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)) AS n_orphans
        |  UNION ALL
        |  SELECT 'lineitem.partkey->part',
        |    (SELECT count(*) FROM lineitem),
        |    (SELECT count(*) FROM lineitem WHERE NOT EXISTS
        |      (SELECT 1 FROM part WHERE p_partkey = l_partkey))
        |  UNION ALL
        |  SELECT 'orders.custkey->customer',
        |    (SELECT count(*) FROM orders),
        |    (SELECT count(*) FROM orders WHERE NOT EXISTS
        |      (SELECT 1 FROM customer WHERE c_custkey = o_custkey))
        |  UNION ALL
        |  SELECT 'customer.nationkey->nation',
        |    (SELECT count(*) FROM customer),
        |    (SELECT count(*) FROM customer WHERE NOT EXISTS
        |      (SELECT 1 FROM nation WHERE n_nationkey = c_nationkey))
        |  UNION ALL
        |  SELECT 'supplier.nationkey->nation',
        |    (SELECT count(*) FROM supplier),
        |    (SELECT count(*) FROM supplier WHERE NOT EXISTS
        |      (SELECT 1 FROM nation WHERE n_nationkey = s_nationkey))
        |) ORDER BY fk_edge""".stripMargin,

    // one UNION-ALL branch per column (oracle clarity over speed; the
    // engine side is the one-pass Expand plan)
    "a9_profile" ->
      """SELECT * FROM (
        |  SELECT 'l_quantity' AS column_name,
        |    count(*) - count(l_quantity) AS n_nulls,
        |    count(DISTINCT l_quantity) AS n_distinct,
        |    round(min(l_quantity), 4) AS vmin, round(max(l_quantity), 4) AS vmax,
        |    CAST(NULL AS VARCHAR) AS smin, CAST(NULL AS VARCHAR) AS smax
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'l_extendedprice', count(*) - count(l_extendedprice),
        |    count(DISTINCT l_extendedprice),
        |    round(min(l_extendedprice), 4), round(max(l_extendedprice), 4),
        |    NULL, NULL
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'l_discount', count(*) - count(l_discount),
        |    count(DISTINCT l_discount),
        |    round(min(l_discount), 4), round(max(l_discount), 4), NULL, NULL
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'l_returnflag', count(*) - count(l_returnflag),
        |    count(DISTINCT l_returnflag), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
        |    min(l_returnflag), max(l_returnflag)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'l_linestatus', count(*) - count(l_linestatus),
        |    count(DISTINCT l_linestatus), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
        |    min(l_linestatus), max(l_linestatus)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'l_shipdate', count(*) - count(l_shipdate),
        |    count(DISTINCT l_shipdate),
        |    floor(epoch(min(l_shipdate))), floor(epoch(max(l_shipdate))),
        |    NULL, NULL
        |  FROM lineitem
        |) ORDER BY column_name""".stripMargin,

    // identical Laplace smoothing and micro-unit quantization; the
    // total row is an exact integer sum of the per-bucket terms
    // identical integer-cents sums; the pinned avg-then-ratio division
    // order keeps every step exact
    "a14_seasonality" ->
      """WITH o AS (
        |  SELECT month(o_orderdate) AS m,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM orders),
        |bym AS (SELECT m, count(*) AS n_orders,
        |          CAST(sum(cents) AS BIGINT) AS sum_cents
        |        FROM o GROUP BY m),
        |base AS (SELECT CAST(sum(sum_cents) AS HUGEINT) //
        |           CAST(sum(n_orders) AS HUGEINT) AS avg_all FROM bym)
        |SELECT m, n_orders, sum_cents,
        |  CAST((sum_cents // n_orders) * 1000000 // avg_all AS BIGINT) AS idx_ppm
        |FROM bym, base ORDER BY m""".stripMargin,

    // the same four per-FD distinct aggregates, unioned
    "a13_fd_audit" ->
      """WITH f1 AS (
        |  SELECT 'l_orderkey->o_custkey' AS fd, count(*) AS n_keys,
        |    CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating,
        |    max(nd) AS max_rhs
        |  FROM (SELECT l_orderkey, count(DISTINCT o_custkey) AS nd
        |        FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY 1)),
        |f2 AS (
        |  SELECT 'l_orderkey->l_linestatus' AS fd, count(*) AS n_keys,
        |    CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating,
        |    max(nd) AS max_rhs
        |  FROM (SELECT l_orderkey, count(DISTINCT l_linestatus) AS nd
        |        FROM lineitem GROUP BY 1)),
        |f3 AS (
        |  SELECT 'l_partkey->l_suppkey' AS fd, count(*) AS n_keys,
        |    CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating,
        |    max(nd) AS max_rhs
        |  FROM (SELECT l_partkey, count(DISTINCT l_suppkey) AS nd
        |        FROM lineitem GROUP BY 1)),
        |f4 AS (
        |  SELECT 'o_custkey->o_orderpriority' AS fd, count(*) AS n_keys,
        |    CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating,
        |    max(nd) AS max_rhs
        |  FROM (SELECT o_custkey, count(DISTINCT o_orderpriority) AS nd
        |        FROM orders GROUP BY 1)),
        |u AS (SELECT * FROM f1 UNION ALL SELECT * FROM f2
        |      UNION ALL SELECT * FROM f3 UNION ALL SELECT * FROM f4)
        |SELECT fd, n_keys, n_violating,
        |  n_violating * 1000000 // n_keys AS viol_ppm, max_rhs
        |FROM u ORDER BY fd""".stripMargin,

    // the same partial-merge algebra; the audit recomputes from the
    // full scan and pins equality per group
    "a12_ivm" ->
      """WITH part AS (
        |  SELECT l_returnflag, l_linestatus,
        |    CASE WHEN l_shipdate < TIMESTAMP '1998-01-01' THEN 0 ELSE 1 END AS d,
        |    CAST(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT) AS qty_c,
        |    count(*) AS n, min(l_shipdate) AS first_ship, max(l_shipdate) AS last_ship
        |  FROM lineitem GROUP BY 1, 2, 3),
        |merged AS (
        |  SELECT l_returnflag, l_linestatus,
        |    CAST(sum(qty_c) AS BIGINT) AS qty_c, CAST(sum(n) AS BIGINT) AS n,
        |    min(first_ship) AS first_ship, max(last_ship) AS last_ship
        |  FROM part GROUP BY 1, 2),
        |full_r AS (
        |  SELECT l_returnflag, l_linestatus,
        |    CAST(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT) AS f_qty,
        |    count(*) AS f_n
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT m.l_returnflag, m.l_linestatus, m.qty_c, m.n,
        |  m.first_ship, m.last_ship,
        |  m.qty_c = f.f_qty AND m.n = f.f_n AS ivm_exact
        |FROM merged m JOIN full_r f USING (l_returnflag, l_linestatus)
        |ORDER BY m.l_returnflag, m.l_linestatus""".stripMargin,

    // leading digit from the exact integer-cents string; expectation
    // quantized floor(log10(1+1/d)*1e6+0.5), far from every boundary
    "a11_benford" ->
      """WITH c AS (
        |  SELECT CAST(substr(CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
        |    AS VARCHAR), 1, 1) AS INT) AS digit
        |  FROM orders),
        |g AS (SELECT digit, CAST(count(*) AS BIGINT) AS n FROM c GROUP BY digit),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM g)
        |SELECT digit, n, n * 1000000 // total AS obs_ppm,
        |  CAST(floor(log10(1 + 1.0 / digit) * 1e6 + 0.5) AS BIGINT) AS exp_ppm,
        |  n * 1000000 // total -
        |    CAST(floor(log10(1 + 1.0 / digit) * 1e6 + 0.5) AS BIGINT) AS dev_ppm
        |FROM g, t ORDER BY digit""".stripMargin,

    "a10_psi_drift" ->
      """WITH o AS (
        |  SELECT year(o_orderdate) AS y,
        |    least(CAST(floor(o_totalprice / 50000) AS BIGINT), 9) AS bucket
        |  FROM orders WHERE year(o_orderdate) IN (1996, 1997)),
        |cnt AS (
        |  SELECT bucket,
        |    CAST(sum(CASE WHEN y = 1996 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(sum(CASE WHEN y = 1997 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
        |  FROM o GROUP BY bucket),
        |tot AS (SELECT CAST(sum(n_a) AS BIGINT) AS ta,
        |               CAST(sum(n_b) AS BIGINT) AS tb FROM cnt),
        |sp AS (SELECT CAST(unnest(generate_series(0, 9)) AS BIGINT) AS bucket),
        |terms AS (
        |  SELECT sp.bucket, COALESCE(cnt.n_a, 0) AS n_a, COALESCE(cnt.n_b, 0) AS n_b,
        |    CAST(floor(((COALESCE(cnt.n_a, 0) + 1) * 1.0 / (tot.ta + 10) -
        |                (COALESCE(cnt.n_b, 0) + 1) * 1.0 / (tot.tb + 10)) *
        |      ln(((COALESCE(cnt.n_a, 0) + 1) * 1.0 / (tot.ta + 10)) /
        |         ((COALESCE(cnt.n_b, 0) + 1) * 1.0 / (tot.tb + 10))) * 1e6 + 0.5)
        |      AS BIGINT) AS t6
        |  FROM sp LEFT JOIN cnt ON sp.bucket = cnt.bucket, tot)
        |SELECT * FROM (
        |  SELECT bucket, n_a, n_b, round(t6 / 1e6, 6) AS psi_term FROM terms
        |  UNION ALL
        |  SELECT CAST(-1 AS BIGINT), CAST(sum(n_a) AS BIGINT),
        |    CAST(sum(n_b) AS BIGINT), round(CAST(sum(t6) AS BIGINT) / 1e6, 6)
        |  FROM terms)
        |ORDER BY bucket""".stripMargin,

    "a7_percentiles" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.25), 4) AS q25,
        |  round(quantile_cont(l_quantity, 0.5), 4) AS q50,
        |  round(quantile_cont(l_quantity, 0.75), 4) AS q75,
        |  round(quantile_cont(l_extendedprice, 0.95), 4) AS p95
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "cal1_date_parts" ->
      """SELECT CAST(isodow(o_orderdate) AS BIGINT) AS dow,
        |  CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
        |  count(*) AS n, round(sum(o_totalprice), 4) AS total
        |FROM orders GROUP BY 1, 2 ORDER BY dow, qtr""".stripMargin,

    "w4_pct_rank" ->
      """SELECT o_orderkey, o_orderpriority,
        |  round(percent_rank() OVER w, 6) AS pct,
        |  round(cume_dist() OVER w, 6) AS cd
        |FROM orders WHERE o_custkey < 50
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice)
        |ORDER BY o_orderkey""".stripMargin,

    "sub_exists" ->
      """SELECT c_custkey, c_acctbal
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 200000)
        |ORDER BY c_custkey""".stripMargin,

    "sub_scalar" ->
      """SELECT n_name,
        |  (SELECT count(*) FROM customer WHERE c_nationkey = n_nationkey) AS n_cust,
        |  (SELECT round(coalesce(avg(c_acctbal), 0), 4) FROM customer
        |   WHERE c_nationkey = n_nationkey) AS avg_bal
        |FROM nation ORDER BY n_name""".stripMargin,

    "str_funcs" ->
      """SELECT p_partkey,
        |  upper(substr(p_name, 1, 8)) AS pfx,
        |  length(p_name) AS len,
        |  regexp_replace(p_name, '[aeiou]', '_', 'g') AS devowel,
        |  concat_ws('|', p_brand, p_type) AS tag,
        |  lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS padded
        |FROM part WHERE p_partkey < 200 ORDER BY p_partkey""".stripMargin,

    "skew_salted_agg" ->
      """SELECT l_returnflag, round(sum(l_quantity), 4) AS sum_qty,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "w2_frames" ->
      """SELECT o_custkey, o_orderkey,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
        |    ROWS UNBOUNDED PRECEDING), 4) AS running_total,
        |  round(avg(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
        |    ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING), 4) AS sliding_avg3,
        |  round(lag(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderkey), 4) AS prev_price,
        |  round(lead(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderkey), 4) AS next_price
        |FROM orders WHERE o_custkey < 30
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "p3_hash_sample" ->
      """SELECT lang, count(*) AS n_sampled,
        |  CAST(sum(n_chars) AS BIGINT) AS sampled_chars
        |FROM documents
        |WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 100
        |      < (CASE WHEN lang = 'en' THEN 50 WHEN lang = 'de' THEN 20 ELSE 10 END)
        |GROUP BY lang ORDER BY lang""".stripMargin,

    "p2_pivot" ->
      """SELECT o_orderpriority,
        |  round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 4) AS total_f,
        |  round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 4) AS total_o,
        |  round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 4) AS total_p
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    // approx_stats: the exact columns are cross-engine; the tolerance
    // booleans are asserted as literal TRUE — DuckDB cannot run Spark's
    // sketches, but it CAN demand they land inside their error envelope
    "approx_stats" ->
      """SELECT l_returnflag,
        |  CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
        |  round(quantile_cont(l_extendedprice, 0.5), 4) AS exact_p50,
        |  TRUE AS cd_ok, TRUE AS p50_ok
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  )
}
