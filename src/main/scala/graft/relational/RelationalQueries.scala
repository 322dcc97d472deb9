package graft.relational

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** Relational operator surface (SURVEY.md §2.2–§2.8) exercised over the
  * driver's TPC-H-ish tables, each paired with a DuckDB oracle.
  *
  * Design notes for 100 TB scale:
  *  - filters/projections are plain Catalyst expressions → parquet pushdown
  *    and column pruning are free (verified via .explain in the specs);
  *  - small dimension tables are broadcast explicitly;
  *  - aggregates use exact DECIMAL accumulation so results are partition-
  *    order independent (a requirement for distributed determinism, not just
  *    oracle parity);
  *  - output-edge sorts are on already-reduced data except for per-row
  *    queries, where the sort is the oracle-comparison contract.
  */
object RelationalQueries {

  private val dec = DecimalType(18, 2)
  private def d2(c: Column): Column = c.cast(dec)
  private def one: Column = lit(1).cast(dec)

  /** q01: TPC-H Q1-style pricing summary — scan + pushdown filter + hash
    * aggregate (partial/final) on low-cardinality keys. [A1,A2,A4,A6-analog]
    */
  val q01 = GraftQuery(
    "q01_pricing_summary",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          sum(d2(col("l_extendedprice"))).cast("double").as("sum_base_price"),
          sum(d2(col("l_extendedprice")) * (one - d2(col("l_discount"))))
            .cast("double").as("sum_disc_price"),
          (sum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          (sum(d2(col("l_extendedprice"))).cast("double") / count(lit(1))).as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    Some("""
      SELECT l_returnflag, l_linestatus,
        sum(l_quantity) AS sum_qty,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        sum(l_quantity) / count(*) AS avg_qty,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
        count(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""))

  /** q02: projection + conjunctive filter — both must reach the parquet scan
    * (PushedFilters / ReadSchema). [P10,P11,P7]
    */
  val q02 = GraftQuery(
    "q02_filter_project",
    (s, dir) =>
      Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit("1998-01-01").cast("timestamp") &&
          col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey")),
    Some("""
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
        AND o_orderpriority = '1-URGENT'
      ORDER BY o_orderkey"""))

  /** q03: global top-k — TakeOrderedAndProject, no full sort at scale.
    * [O2,O3] Deterministic tiebreak on the key.
    */
  val q03 = GraftQuery(
    "q03_topk_orders",
    (s, dir) =>
      Tables.orders(s, dir)
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice")),
    Some("""
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders
      ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 10"""))

  /** q04: fact ⋈ broadcast dimension + aggregate. customer is the small
    * side — broadcast() avoids shuffling orders. [J, A4]
    */
  val q04 = GraftQuery(
    "q04_join_broadcast",
    (s, dir) => {
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(
          count(lit(1)).as("n_orders"),
          sum(d2(col("o_totalprice"))).cast("double").as("revenue"))
        .orderBy(col("c_mktsegment"))
    },
    Some("""
      SELECT c_mktsegment,
             count(*) AS n_orders,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment"""))

  /** q05: 5-table join chain (TPC-H Q5 shape): one shuffle join on the fact
    * tables, broadcast for every dimension. [J]
    */
  val q05 = GraftQuery(
    "q05_join_multiway",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      val c = Tables.customer(s, dir)
      val n = Tables.nation(s, dir)
      val r = Tables.region(s, dir)
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(
          sum(d2(col("l_extendedprice")) * (one - d2(col("l_discount"))))
            .cast("double").as("revenue"),
          count(lit(1)).as("n_lineitems"))
        .orderBy(col("n_name"))
    },
    Some("""
      SELECT n_name,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        count(*) AS n_lineitems
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY n_name
      ORDER BY n_name"""))

  /** q06: latest-per-key — the reference's flagship view pattern
    * (ROW_NUMBER ... WHERE rn=1; SURVEY §2.5 W1,
    * reference create_enhanced_views.py:84-94) over the events table.
    * Deterministic tiebreak on event_id (SURVEY §7.4.2).
    */
  val q06 = GraftQuery(
    "q06_latest_per_key",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      Tables.events(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("value"), col("ts").as("ts_us"))
        .orderBy(col("user_id"))
    },
    Some("""
      SELECT user_id, event_id, event_type, value, ts_us FROM (
        SELECT user_id, event_id, event_type, value,
               CAST(ts AS TIMESTAMP) AS ts_us,
               ROW_NUMBER() OVER (PARTITION BY user_id
                 ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
        FROM events) t
      WHERE rn = 1
      ORDER BY user_id"""))

  /** q07: left-semi join (EXISTS). [§2.3 join surface] */
  val q07 = GraftQuery(
    "q07_semi_join",
    (s, dir) => {
      val c = Tables.customer(s, dir)
      val urgent = Tables.orders(s, dir)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey"))
      c.join(urgent, c("c_custkey") === urgent("o_custkey"), "left_semi")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers"))
        .orderBy(col("c_mktsegment"))
    },
    Some("""
      SELECT c_mktsegment, count(*) AS n_customers
      FROM customer
      WHERE EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey
                      AND o_orderpriority = '1-URGENT')
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment"""))

  /** q08: left-anti join (NOT EXISTS): parts that never shipped. */
  val q08 = GraftQuery(
    "q08_anti_join",
    (s, dir) => {
      val p = Tables.part(s, dir)
      val li = Tables.lineitem(s, dir).select(col("l_partkey"))
      p.join(li, p("p_partkey") === li("l_partkey"), "left_anti")
        .select(col("p_partkey"), col("p_brand"), col("p_size"))
        .orderBy(col("p_partkey"))
    },
    Some("""
      SELECT p_partkey, p_brand, p_size
      FROM part
      WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
      ORDER BY p_partkey"""))

  /** q09: UNION ALL + grouped count. [U1] */
  val q09 = GraftQuery(
    "q09_union_group",
    (s, dir) => {
      val sup = Tables.supplier(s, dir).select(col("s_nationkey").as("nk"))
      val cus = Tables.customer(s, dir).select(col("c_nationkey").as("nk"))
      sup.unionByName(cus).groupBy(col("nk"))
        .agg(count(lit(1)).as("n")).orderBy(col("nk"))
    },
    Some("""
      SELECT nk, count(*) AS n FROM (
        SELECT s_nationkey AS nk FROM supplier
        UNION ALL
        SELECT c_nationkey AS nk FROM customer) t
      GROUP BY nk ORDER BY nk"""))

  /** q10: per-row derived metrics — pure narrow map, no shuffle.
    * [P12; reference sample_iceberg_asset.py:89-91 analog]
    */
  val q10 = GraftQuery(
    "q10_derived_metrics",
    (s, dir) =>
      Tables.lineitem(s, dir)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
            (lit(1.0) + col("l_tax"))).as("charge"),
          when(col("l_quantity") >= 25, "bulk").otherwise("small").as("order_class"))
        .orderBy(col("l_orderkey"), col("l_linenumber")),
    Some("""
      SELECT l_orderkey, l_linenumber,
             l_extendedprice * (1.0 - l_discount) AS revenue,
             l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS charge,
             CASE WHEN l_quantity >= 25 THEN 'bulk' ELSE 'small' END AS order_class
      FROM lineitem
      ORDER BY l_orderkey, l_linenumber"""))

  /** q11: CASE WHEN classification + grouped tallies — the reference's
    * record_type classifier shape (P8/A8, enhanced_all.py:53-68) applied to
    * events.
    */
  val q11 = GraftQuery(
    "q11_classification",
    (s, dir) =>
      Tables.events(s, dir)
        .withColumn("event_class",
          when(col("event_type").isin("purchase", "signup"), "conversion")
            .when(col("event_type") === "error", "failure")
            .otherwise("engagement"))
        .groupBy(col("event_class"))
        .agg(
          count(lit(1)).as("n"),
          sum(d2(col("value"))).cast("double").as("total_value"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("event_class")),
    Some("""
      SELECT CASE WHEN event_type IN ('purchase','signup') THEN 'conversion'
                  WHEN event_type = 'error' THEN 'failure'
                  ELSE 'engagement' END AS event_class,
             count(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
             count(DISTINCT user_id) AS n_users
      FROM events
      GROUP BY 1
      ORDER BY event_class"""))

  /** q12: grid density — the reference's spatial density analysis
    * (J1+A3+A5, bike_spatial_density_analysis.py) re-expressed as O(n)
    * floor-bucketing instead of the O(cells×points) nested loop: bounds via
    * a broadcast 1-row aggregate, cell assignment as a narrow projection,
    * one shuffle for the per-cell aggregate.
    */
  val q12 = GraftQuery(
    "q12_grid_density",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val bounds = ev.agg(
        min(col("value")).as("vmin"), max(col("value")).as("vmax"),
        min(col("user_id")).as("umin"), max(col("user_id")).as("umax"))
      // zero-range guard: a degenerate extent (all values equal — one row,
      // or one distinct value in the slice) bins everything into cell 0
      // instead of dividing by zero; mirrored in the oracle's CASE
      ev.crossJoin(broadcast(bounds))
        .withColumn("cell_x",
          when(col("vmax") === col("vmin"), lit(0L)).otherwise(
            least(floor((col("value") - col("vmin")) /
              ((col("vmax") - col("vmin")) / lit(20.0))), lit(19L))).cast("long"))
        .withColumn("cell_y",
          when(col("umax") === col("umin"), lit(0L)).otherwise(
            least(floor((col("user_id") - col("umin")) /
              ((col("umax") - col("umin")) / lit(10.0))), lit(9L))).cast("long"))
        .groupBy(col("cell_x"), col("cell_y"))
        .agg(
          count(lit(1)).as("n_events"),
          sum(d2(col("value"))).cast("double").as("total_value"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("cell_x"), col("cell_y"))
    },
    Some("""
      SELECT
        CAST(CASE WHEN vmax = vmin THEN 0
                  ELSE least(floor((value - vmin) / ((vmax - vmin) / 20.0)), 19)
             END AS BIGINT) AS cell_x,
        CAST(CASE WHEN umax = umin THEN 0
                  ELSE least(floor((user_id - umin) / ((umax - umin) / 10.0)), 9)
             END AS BIGINT) AS cell_y,
        count(*) AS n_events,
        CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
        count(DISTINCT user_id) AS n_users
      FROM events CROSS JOIN (
        SELECT min(value) AS vmin, max(value) AS vmax,
               CAST(min(user_id) AS DOUBLE) AS umin, CAST(max(user_id) AS DOUBLE) AS umax
        FROM events) b
      GROUP BY 1, 2
      ORDER BY cell_x, cell_y"""))

  /** q13: multi-stat daily summary (A6/A7 analog): mean/max/min/stddev per
    * (event_type, day). stddev is computed from DECIMAL-exact moments so the
    * result is order-independent (pandas ddof=1 / stddev_samp semantics):
    * sqrt((Σx² − (Σx)²/n) / (n−1)).
    */
  val q13 = GraftQuery(
    "q13_daily_stats",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val grouped = ev
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
        .agg(
          count(lit(1)).as("n"),
          sum(d2(col("value"))).cast("double").as("sum_value"),
          sum(d2(col("value")) * d2(col("value"))).cast("double").as("sum_sq"),
          min(col("value")).as("min_value"),
          max(col("value")).as("max_value"))
      grouped.select(
        col("event_type"), col("day"), col("n"),
        (col("sum_value") / col("n")).as("avg_value"),
        col("min_value"), col("max_value"),
        when(col("n") > 1,
          sqrt(greatest(
            (col("sum_sq") - col("sum_value") * col("sum_value") / col("n")) /
              (col("n") - 1), lit(0.0)))).as("stddev_value"))
        .orderBy(col("event_type"), col("day"))
    },
    Some("""
      SELECT event_type, day, n,
             sum_value / n AS avg_value,
             min_value, max_value,
             CASE WHEN n > 1
               THEN sqrt(greatest((sum_sq - sum_value * sum_value / n) / (n - 1), 0.0))
             END AS stddev_value
      FROM (
        SELECT event_type,
               date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
               count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
               CAST(sum(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_sq,
               min(value) AS min_value,
               max(value) AS max_value
        FROM events
        GROUP BY 1, 2) t
      ORDER BY event_type, day"""))

  /** q14: ROLLUP grouping sets. NULLS FIRST on both sides — Spark default
    * asc is nulls-first, DuckDB default is nulls-last.
    */
  val q14 = GraftQuery(
    "q14_rollup",
    (s, dir) =>
      Tables.lineitem(s, dir)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first),
    Some("""
      SELECT l_returnflag, l_linestatus, count(*) AS n, sum(l_quantity) AS sum_qty
      FROM lineitem
      GROUP BY ROLLUP (l_returnflag, l_linestatus)
      ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"""))

  /** q15: global bounds (A3 bounding-box analog) — single-row aggregate. */
  val q15 = GraftQuery(
    "q15_bounds",
    (s, dir) =>
      Tables.events(s, dir).agg(
        min(col("value")).as("vmin"), max(col("value")).as("vmax"),
        min(col("ts")).as("ts_min"), max(col("ts")).as("ts_max"),
        count(lit(1)).as("n")),
    Some("""
      SELECT min(value) AS vmin, max(value) AS vmax,
             min(CAST(ts AS TIMESTAMP)) AS ts_min,
             max(CAST(ts AS TIMESTAMP)) AS ts_max,
             count(*) AS n
      FROM events"""))

  /** q17: date bucketing (F5 analog): year/month extraction + date_trunc. */
  val q17 = GraftQuery(
    "q17_date_buckets",
    (s, dir) =>
      Tables.orders(s, dir)
        .groupBy(
          year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo"),
          date_trunc("month", col("o_orderdate")).as("month_start"))
        .agg(
          count(lit(1)).as("n_orders"),
          sum(d2(col("o_totalprice"))).cast("double").as("total"))
        .orderBy(col("yr"), col("mo")),
    Some("""
      SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
             CAST(month(o_orderdate) AS INTEGER) AS mo,
             date_trunc('month', o_orderdate) AS month_start,
             count(*) AS n_orders,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM orders
      GROUP BY 1, 2, 3
      ORDER BY yr, mo"""))

  /** q18: tumbling 1-hour window aggregate (T6) — batch equivalent of the
    * streaming hourly rollup; `window()` is epoch-aligned so it matches
    * date_trunc('hour').
    */
  val q18 = GraftQuery(
    "q18_hourly_window",
    (s, dir) =>
      Tables.events(s, dir)
        .groupBy(window(col("ts"), "1 hour"))
        .agg(
          count(lit(1)).as("n"),
          sum(d2(col("value"))).cast("double").as("total_value"))
        .select(col("window.start").as("hour_start"), col("n"), col("total_value"))
        .orderBy(col("hour_start")),
    Some("""
      SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour_start,
             count(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      FROM events
      GROUP BY 1
      ORDER BY hour_start"""))

  val all: Seq[GraftQuery] = Seq(
    q01, q02, q03, q04, q05, q06, q07, q08, q09, q10,
    q11, q12, q13, q14, q15, q17, q18)
}
