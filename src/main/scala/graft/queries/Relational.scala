package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Relational query pack over the TPC-H-ish testdata tables.
  *
  * Each entry pairs a Spark DataFrame program with a DuckDB-runnable ANSI
  * SQL oracle producing the same rows/columns. These exercise the stock
  * Spark operators the reference engine lacks entirely (SURVEY.md §2
  * "relational-operator gap analysis") plus tabular analogues of the
  * reference's own dataflow operators (windowed mean = reference
  * `compress/czi_to_zarr.py:410-454`; round-robin partitioning =
  * `zeiss_job.py:29-40`; sorted scan = `zeiss_job.py:42-60`; min/max
  * bounds = `czi_to_zarr.py:535-549`; percentile = `czi_to_zarr.py:551-555`).
  *
  * Determinism rules (driver hashes values after sorting columns by name):
  *   - every double aggregate is `round(_, 4)` on both sides;
  *   - every query ends in a total ORDER BY;
  *   - integer division is explicit `floor(x / k)` cast to long on both
  *     sides (Spark `cast(int)` truncates toward zero while DuckDB
  *     rounds — never rely on implicit casts);
  *   - no raw timestamp columns in outputs (epoch seconds instead);
  *   - SUM of integer columns is CAST(... AS BIGINT) in the oracle —
  *     DuckDB's sum(bigint) returns int128, which breaks value compare.
  */
object Relational {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- TPC-H-style core: scan + filter + hash aggregate (pushdown check) ---
    "q1_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 4).as("sum_qty"),
          round(sum(col("l_extendedprice")), 4).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4).as("sum_disc_price"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // --- broadcast-able dimension join (small dims: region x nation) ---
    "q2_join_small_dims" -> ((s, dir) => {
      val nation = t(s, dir, "nation")
      val region = t(s, dir, "region")
      val customer = t(s, dir, "customer")
      customer
        .join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"))
        .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_customers"),
             round(sum(col("c_acctbal")), 4).as("total_acctbal"))
        .orderBy(col("r_name"), col("n_name"))
    }),

    // --- 3-way join + agg + top-k with deterministic tiebreak.
    //     customer/orders only FILTER lineitem here (one customer per
    //     order, so no fanout): reduce them to a keys relation and
    //     broadcast it — lineitem, the 100-TB side, never shuffles for
    //     the join, only for the final partial-agg by orderkey, and the
    //     top-k is a TakeOrdered, never a full sort. ---
    "q3_join_topk" -> ((s, dir) => {
      val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
      val keys = c.join(o, c("c_custkey") === o("o_custkey")).select(o("o_orderkey"))
      l.join(broadcast(keys), l("l_orderkey") === keys("o_orderkey"))
        .groupBy(col("o_orderkey"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4).as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    }),

    // --- multi-way join across the whole star ---
    "q5_multi_join" -> ((s, dir) => {
      val r = t(s, dir, "region")
      val n = t(s, dir, "nation")
      val su = t(s, dir, "supplier")
      val li = t(s, dir, "lineitem")
      li.join(su, li("l_suppkey") === su("s_suppkey"))
        .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4).as("revenue"),
             count(lit(1)).as("n_items"))
        .orderBy(col("r_name"))
    }),

    // --- window function: rank within partition ---
    "w1_window_rank" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val o = t(s, dir, "orders")
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      o.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("o_custkey"), col("o_orderkey"),
                round(col("o_totalprice"), 4).as("price"), col("rk"))
        .orderBy(col("o_custkey"), col("rk"), col("o_orderkey"))
    }),

    // --- semi/anti join: customers with vs without orders ---
    "j1_semi_anti" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      val withO = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select(lit("with_orders").as("kind"), col("c_custkey"))
      val withoutO = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(lit("no_orders").as("kind"), col("c_custkey"))
      withO.unionAll(withoutO).orderBy(col("kind"), col("c_custkey"))
    }),

    // --- FULL OUTER reconciliation: rich customers vs big spenders.
    //     The standard two-source diff: classify every key as both /
    //     left_only / right_only with one full outer join (a single
    //     custkey shuffle) and roll the classes up. ---
    "j2_full_outer" -> ((s, dir) => {
      val rich = t(s, dir, "customer").filter(col("c_acctbal") > 5000)
        .select(col("c_custkey").as("lk"))
      val big = t(s, dir, "orders")
        .groupBy(col("o_custkey")).agg(sum(col("o_totalprice")).as("spend"))
        .filter(col("spend") > 300000)
        .select(col("o_custkey").as("rk"))
      rich.join(big, col("lk") === col("rk"), "full_outer")
        .select(when(col("lk").isNotNull && col("rk").isNotNull, "both")
          .when(col("lk").isNotNull, "rich_only").otherwise("spender_only").as("kind"))
        .groupBy(col("kind")).agg(count(lit(1)).as("n"))
        .orderBy(col("kind"))
    }),

    // --- set operations ---
    "set_ops" -> ((s, dir) => {
      val custNations = t(s, dir, "customer").select(col("c_nationkey").cast("int").as("nk")).distinct()
      val suppNations = t(s, dir, "supplier").select(col("s_nationkey").cast("int").as("nk")).distinct()
      val both = custNations.intersect(suppNations).select(lit("both").as("kind"), col("nk"))
      val custOnly = custNations.except(suppNations).select(lit("cust_only").as("kind"), col("nk"))
      val suppOnly = suppNations.except(custNations).select(lit("supp_only").as("kind"), col("nk"))
      both.unionAll(custOnly).unionAll(suppOnly).orderBy(col("kind"), col("nk"))
    }),

    // --- rollup (grouping sets) ---
    "rollup_agg" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_cust"), round(sum(col("c_acctbal")), 4).as("bal"))
        .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
    }),

    // --- exact distinct counts ---
    "distinct_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_orderkey")).as("n_orders"),
             countDistinct(col("l_partkey")).as("n_parts"))
        .orderBy(col("l_returnflag"))
    }),

    // --- reference S1: deterministic sorted scan (zeiss_job.py:42-60) ---
    "s1_sorted_scan" -> ((s, dir) => {
      t(s, dir, "documents")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
        .orderBy(col("source"))
    }),

    // --- Z-order clustering layout audit — the lakehouse write
    //     optimization (Delta OPTIMIZE ZORDER / Iceberg sort orders)
    //     as an auditable operator: interleave two join/filter columns
    //     into a Morton key with the codegen'd `zorder_key` expression,
    //     then show that every contiguous key range occupies a BOUNDED
    //     rectangle of the (x, y) domain — each aligned 2048-key
    //     bucket spans at most 64x32 of the 256x256 grid, which is
    //     precisely why sorting a 100 TB table by this key before
    //     writing lets parquet min/max zone maps prune scans on EITHER
    //     column. The audit itself is one hash aggregate into 32
    //     groups; the sort it certifies is the writer's, not this
    //     query's. ---
    "s2_zorder_layout" -> ((s, dir) => {
      val pts = t(s, dir, "lineitem").select(
        pmod(col("l_partkey"), lit(256)).cast("long").as("x"),
        pmod(col("l_suppkey"), lit(256)).cast("long").as("y"))
      pts.select(col("x"), col("y"),
          graft.functions.zorder_key(col("x"), col("y")).as("z"))
        .groupBy(expr("z div 2048").as("zbucket"))
        .agg(count(lit(1)).as("n"),
          min(col("x")).as("xmin"), max(col("x")).as("xmax"),
          min(col("y")).as("ymin"), max(col("y")).as("ymax"))
        .orderBy(col("zbucket"))
    }),

    // --- reference P1: round-robin partitioner (zeiss_job.py:29-40) ---
    "p1_round_robin" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(pmod(col("doc_id"), lit(8)).as("partition_id"), col("doc_id"))
        .groupBy(col("partition_id"))
        .agg(count(lit(1)).as("n"), min(col("doc_id")).as("first_doc"),
             max(col("doc_id")).as("last_doc"))
        .orderBy(col("partition_id"))
    }),

    // --- reference A2: per-group min/max bounds (czi_to_zarr.py:535-549) ---
    "a2_minmax" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(min(col("l_extendedprice")).as("min_price"),
             max(col("l_extendedprice")).as("max_price"),
             min(col("l_quantity")).as("min_qty"),
             max(col("l_quantity")).as("max_qty"))
        .orderBy(col("l_returnflag"))
    }),

    // --- reference A3: percentile stretch (czi_to_zarr.py:551-555) ---
    "a3_percentile" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_linestatus"))
        .agg(round(expr("percentile(l_extendedprice, 0.001)"), 4).as("p_low"),
             round(expr("percentile(l_extendedprice, 0.95)"), 4).as("p_high"))
        .orderBy(col("l_linestatus"))
    }),

    // --- reference A1 analogue: 2x2x2 windowed-mean downsample on a dense
    //     grid (czi_to_zarr.py:410-454): docs laid out on a (z,y,x) grid,
    //     value = n_chars; one pyramid halving with dtype-preserving mean. ---
    "a1_windowed_mean" -> ((s, dir) => {
      val d = t(s, dir, "documents")
        .select(
          floor(col("doc_id") / lit(256)).as("z"),
          floor((col("doc_id") % 256) / lit(16)).as("y"),
          (col("doc_id") % 16).as("x"),
          col("n_chars"))
      d.groupBy(
          floor(col("z") / 2).as("zb"),
          floor(col("y") / 2).as("yb"),
          floor(col("x") / 2).as("xb"))
        .agg(round(avg(col("n_chars")), 4).as("mean_val"),
             floor(avg(col("n_chars"))).as("mean_preserved"),
             count(lit(1)).as("window_pop"))
        .orderBy(col("zb"), col("yb"), col("xb"))
    }),

    // --- event-time tumbling window over the events table (batch form) ---
    "e1_tumbling_window" -> ((s, dir) => {
      t(s, dir, "events")
        .select((floor(unix_timestamp(col("ts")) / 3600) * 3600).cast("long").as("bucket"),
                col("event_type"), col("value"))
        .groupBy(col("bucket"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("total_value"))
        .orderBy(col("bucket"), col("event_type"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 4) AS sum_qty,
        |  round(sum(l_extendedprice), 4) AS sum_base_price,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS sum_disc_price,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q2_join_small_dims" ->
      """SELECT r_name, n_name, count(*) AS n_customers,
        |  round(sum(c_acctbal), 4) AS total_acctbal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,

    "q3_join_topk" ->
      """SELECT o_orderkey,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY o_orderkey
        |ORDER BY revenue DESC, o_orderkey
        |LIMIT 10""".stripMargin,

    "q5_multi_join" ->
      """SELECT r_name,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name
        |ORDER BY r_name""".stripMargin,

    "w1_window_rank" ->
      """SELECT o_custkey, o_orderkey, round(o_totalprice, 4) AS price, rk
        |FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders) t
        |WHERE rk <= 3
        |ORDER BY o_custkey, rk, o_orderkey""".stripMargin,

    "j2_full_outer" ->
      """WITH rich AS (
        |  SELECT c_custkey AS lk FROM customer WHERE c_acctbal > 5000),
        |big AS (
        |  SELECT o_custkey AS rk FROM orders
        |  GROUP BY o_custkey HAVING sum(o_totalprice) > 300000)
        |SELECT CASE WHEN lk IS NOT NULL AND rk IS NOT NULL THEN 'both'
        |            WHEN lk IS NOT NULL THEN 'rich_only'
        |            ELSE 'spender_only' END AS kind, count(*) AS n
        |FROM rich FULL OUTER JOIN big ON lk = rk
        |GROUP BY 1 ORDER BY kind""".stripMargin,

    "j1_semi_anti" ->
      """SELECT 'with_orders' AS kind, c_custkey FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders)
        |UNION ALL
        |SELECT 'no_orders' AS kind, c_custkey FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
        |ORDER BY kind, c_custkey""".stripMargin,

    "set_ops" ->
      """WITH cn AS (SELECT DISTINCT CAST(c_nationkey AS INT) AS nk FROM customer),
        |     sn AS (SELECT DISTINCT CAST(s_nationkey AS INT) AS nk FROM supplier)
        |SELECT 'both' AS kind, nk FROM (SELECT nk FROM cn INTERSECT SELECT nk FROM sn)
        |UNION ALL
        |SELECT 'cust_only' AS kind, nk FROM (SELECT nk FROM cn EXCEPT SELECT nk FROM sn)
        |UNION ALL
        |SELECT 'supp_only' AS kind, nk FROM (SELECT nk FROM sn EXCEPT SELECT nk FROM cn)
        |ORDER BY kind, nk""".stripMargin,

    "rollup_agg" ->
      """SELECT r_name, n_name, count(*) AS n_cust, round(sum(c_acctbal), 4) AS bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin,

    "distinct_agg" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_orderkey) AS n_orders,
        |  count(DISTINCT l_partkey) AS n_parts
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "s1_sorted_scan" ->
      """SELECT source, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    // the Morton key spelled out as the 32-term shift/mask sum the
    // codegen'd expression computes (bit i of x -> 2i, of y -> 2i+1)
    "s2_zorder_layout" -> {
      val terms = (0 until 16).map(i =>
        s"(((x >> $i) & 1) << ${2 * i}) + (((y >> $i) & 1) << ${2 * i + 1})")
        .mkString(" +\n        |    ")
      s"""WITH p AS (
         |  SELECT l_partkey % 256 AS x, l_suppkey % 256 AS y FROM lineitem),
         |z AS (
         |  SELECT x, y,
         |    $terms AS z
         |  FROM p)
         |SELECT z // 2048 AS zbucket, count(*) AS n,
         |  min(x) AS xmin, max(x) AS xmax, min(y) AS ymin, max(y) AS ymax
         |FROM z GROUP BY 1 ORDER BY zbucket""".stripMargin
    },

    "p1_round_robin" ->
      """SELECT doc_id % 8 AS partition_id, count(*) AS n,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM documents GROUP BY doc_id % 8 ORDER BY partition_id""".stripMargin,

    "a2_minmax" ->
      """SELECT l_returnflag,
        |  min(l_extendedprice) AS min_price, max(l_extendedprice) AS max_price,
        |  min(l_quantity) AS min_qty, max(l_quantity) AS max_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "a3_percentile" ->
      """SELECT l_linestatus,
        |  round(quantile_cont(l_extendedprice, 0.001), 4) AS p_low,
        |  round(quantile_cont(l_extendedprice, 0.95), 4) AS p_high
        |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,

    "a1_windowed_mean" ->
      """WITH grid AS (
        |  SELECT CAST(floor(doc_id / 256) AS BIGINT) AS z,
        |         CAST(floor((doc_id % 256) / 16) AS BIGINT) AS y,
        |         doc_id % 16 AS x, n_chars
        |  FROM documents)
        |SELECT CAST(floor(z / 2) AS BIGINT) AS zb,
        |       CAST(floor(y / 2) AS BIGINT) AS yb,
        |       CAST(floor(x / 2) AS BIGINT) AS xb,
        |  round(avg(n_chars), 4) AS mean_val,
        |  CAST(floor(avg(n_chars)) AS BIGINT) AS mean_preserved,
        |  count(*) AS window_pop
        |FROM grid GROUP BY 1, 2, 3 ORDER BY zb, yb, xb""".stripMargin,

    "e1_tumbling_window" ->
      """SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS bucket,
        |  event_type, count(*) AS n, round(sum(value), 4) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY bucket, event_type""".stripMargin
  )
}
