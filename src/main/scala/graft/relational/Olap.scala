package graft.relational

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** OLAP reporting surface: ROLLUP grouping sets, wide pivot tables, and
  * equi-width histograms — the classic BI layer over the fact table.
  *
  * Scale shapes:
  *  - ROLLUP plans as Expand + one hash aggregate: each row is replicated
  *    once per grouping set BEFORE the shuffle, but partial aggregation
  *    collapses the expansion map-side, so the exchange carries
  *    O(sets x distinct keys) rows — here domain-bounded (flag x status).
  *  - The pivot uses an EXPLICIT value list: Spark's `pivot(col)` overload
  *    first runs a driver-side distinct collect to discover the columns —
  *    a hidden job and an unbounded driver payload at corpus scale. With
  *    the values supplied, the pivot is one conditional aggregate, no
  *    driver involvement; the output width is a declared constant.
  *  - The histogram's min/max is a global 1-row aggregate broadcast to the
  *    bucket map (the accepted global-scalar class); bucketing itself is a
  *    narrow map and the final aggregate is O(buckets).
  */
object Olap {

  private val dec = DecimalType(18, 2)
  private def d2(c: Column): Column = c.cast(dec)

  /** ROLLUP over (l_returnflag, l_linestatus): per-group, per-flag subtotal
    * and grand-total rows, tagged by grouping_id — bit i set means grouping
    * column i is rolled up (Postgres/DuckDB-compatible bit order).
    */
  def rollupSummary(lineitem: DataFrame): DataFrame =
    lineitem
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        grouping_id().as("gid"),
        sum(col("l_quantity")).as("sum_qty"),
        sum(d2(col("l_extendedprice"))).cast("double").as("sum_price"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("gid"), col("l_returnflag"), col("l_linestatus"))

  val PivotPriorities: Seq[(String, String)] = Seq(
    "1-URGENT" -> "p1_urgent", "2-HIGH" -> "p2_high", "3-MEDIUM" -> "p3_medium",
    "4-NOT SPECIFIED" -> "p4_not_specified", "5-LOW" -> "p5_low")

  /** Order counts per status, one column per priority (explicit value list —
    * see the scale note above). Missing combinations surface as 0, not null
    * (pivot-count's null means "group absent", which IS a zero count).
    * Columns are renamed to parquet-safe snake case ("4-NOT SPECIFIED"
    * contains a space, which Spark's parquet writer rejects).
    */
  def pivotPriorityCounts(orders: DataFrame): DataFrame =
    orders
      .groupBy(col("o_orderstatus"))
      .pivot("o_orderpriority", PivotPriorities.map(_._1))
      .agg(count(lit(1)))
      .select(col("o_orderstatus") +:
        PivotPriorities.map { case (v, alias) =>
          coalesce(col(s"`$v`"), lit(0L)).as(alias)
        }: _*)
      .orderBy(col("o_orderstatus"))

  /** Equi-width histogram of `valueCol` in `nBuckets` buckets spanning the
    * observed [min, max]. The top edge folds into the last bucket. Bucket
    * arithmetic is scalar double math evaluated identically in both engines
    * (no accumulation-order sensitivity); counts/sums are exact.
    */
  def histogram(df: DataFrame, valueCol: String, nBuckets: Int): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    val bounds = df.agg(
      min(col(valueCol)).as("mn"), max(col(valueCol)).as("mx"))
    // zero-range guard (oracle mirrors with CASE): a degenerate extent —
    // one row, or one distinct value — puts everything in bucket 0
    // instead of dividing by zero
    df.select(col(valueCol).as("x"))
      .crossJoin(broadcast(bounds))
      .select(
        when(col("mx") === col("mn"), lit(0L)).otherwise(least(
          floor((col("x") - col("mn")) / ((col("mx") - col("mn")) / nBuckets)),
          lit(nBuckets - 1L))).cast("int").as("bucket"),
        col("x"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), sum(d2(col("x"))).cast("double").as("sum_x"))
      .orderBy(col("bucket"))
  }

  /** Wide→long melt of the lineitem measure columns via the native
    * `Dataset.unpivot` (Expand under the hood: each row fans out to one row
    * per measure BEFORE any shuffle — a narrow map, no exchange at all;
    * the output sort is presentation-only). The measure list is explicit
    * and typed: unpivot requires a common value type, so every measure is
    * cast to double up front rather than letting coercion pick.
    */
  def meltMeasures(lineitem: DataFrame, keyMod: Long): DataFrame = {
    val base = lineitem
      .filter(col("l_orderkey") % keyMod === 0)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast("double").as("l_quantity"),
        col("l_extendedprice").cast("double").as("l_extendedprice"),
        col("l_discount").cast("double").as("l_discount"),
        col("l_tax").cast("double").as("l_tax"))
    base.unpivot(
      Array(col("l_orderkey"), col("l_linenumber")),
      Array(col("l_quantity"), col("l_extendedprice"), col("l_discount"),
        col("l_tax")),
      "measure", "value")
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("measure"))
  }

  /** Equi-depth (equal-frequency) histogram per group — the DB-statistics
    * complement to the equi-width `histogram`. Buckets are assigned on the
    * per-(group, value) COUNT TABLE, not per row (the q110 count-table
    * idiom): the window sorts |distinct values| rows per group, never the
    * fact table, so the single-partition-window trap is bounded by value
    * cardinality at any corpus size. All rows of one value land in one
    * bucket (the standard equi-depth statistics semantic: bucket by the
    * value's LAST row's 0-indexed global rank, floor(((cum-1)·k)/n) — all
    * integer math, bit-identical in any engine).
    */
  def equidepthHistogram(lineitem: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val counts = lineitem
      .groupBy(col("l_returnflag").as("grp"), col("l_quantity").as("v"))
      .agg(count(lit(1)).as("c"))
    val byV = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp")).orderBy(col("v"))
    val whole = org.apache.spark.sql.expressions.Window.partitionBy(col("grp"))
    counts
      .withColumn("cum", sum(col("c")).over(byV))
      .withColumn("n", sum(col("c")).over(whole))
      .withColumn("bucket", floor((col("cum") - 1) * k / col("n")))
      .groupBy(col("grp"), col("bucket"))
      .agg(sum(col("c")).as("n_rows"),
        min(col("v")).as("lo"), max(col("v")).as("hi"))
      .orderBy(col("grp"), col("bucket"))
  }

  /** GROUPING SETS over (market segment, order priority): the full cross
    * plus the two one-dimension marginals — the exact-set form of
    * rollup/cube for reports that want specific margins only (a CUBE here
    * would also emit the grand total nobody asked for). Plans as Expand +
    * one hash aggregate like ROLLUP (see the scale note above); both
    * grouping columns are domain-bounded, so the exchange carries
    * O(sets × segments × priorities) rows.
    */
  def segmentPriorityGroupingSets(orders: DataFrame,
                                  customer: DataFrame): DataFrame =
    orders
      .join(customer, col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("segment"),
        col("o_orderpriority").as("priority"), col("o_totalprice"))
      .groupingSets(
        Seq(Seq(col("segment"), col("priority")),
          Seq(col("segment")), Seq(col("priority"))),
        col("segment"), col("priority"))
      .agg(
        grouping_id().as("gid"),
        sum(d2(col("o_totalprice"))).cast("double").as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("gid"), col("segment"), col("priority"))

  // ---- queries -------------------------------------------------------------

  val qRollup = GraftQuery(
    "q97_rollup",
    (s, dir) => rollupSummary(Tables.lineitem(s, dir)),
    Some("""
      SELECT l_returnflag, l_linestatus,
             GROUPING(l_returnflag, l_linestatus) AS gid,
             sum(l_quantity) AS sum_qty,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
             count(*) AS n_rows
      FROM lineitem
      GROUP BY ROLLUP (l_returnflag, l_linestatus)
      ORDER BY gid, l_returnflag, l_linestatus"""))

  val qPivot = GraftQuery(
    "q98_pivot",
    (s, dir) => pivotPriorityCounts(Tables.orders(s, dir)),
    Some("""
      SELECT o_orderstatus,
             count(*) FILTER (o_orderpriority = '1-URGENT') AS p1_urgent,
             count(*) FILTER (o_orderpriority = '2-HIGH') AS p2_high,
             count(*) FILTER (o_orderpriority = '3-MEDIUM') AS p3_medium,
             count(*) FILTER (o_orderpriority = '4-NOT SPECIFIED') AS p4_not_specified,
             count(*) FILTER (o_orderpriority = '5-LOW') AS p5_low
      FROM orders
      GROUP BY o_orderstatus
      ORDER BY o_orderstatus"""))

  val qHistogram = GraftQuery(
    "q99_histogram",
    (s, dir) => histogram(Tables.lineitem(s, dir), "l_extendedprice", nBuckets = 32),
    Some("""
      WITH bounds AS (SELECT min(l_extendedprice) AS mn, max(l_extendedprice) AS mx
                      FROM lineitem)
      SELECT CAST(CASE WHEN mx = mn THEN 0
                       ELSE least(floor((l_extendedprice - mn) / ((mx - mn) / 32)), 31)
                  END AS INTEGER) AS bucket,
             count(*) AS n,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_x
      FROM lineitem CROSS JOIN bounds
      GROUP BY bucket
      ORDER BY bucket"""))

  val qUnpivot = GraftQuery(
    "q113_unpivot",
    (s, dir) => meltMeasures(Tables.lineitem(s, dir), keyMod = 500L),
    Some("""
      WITH f AS (SELECT * FROM lineitem WHERE l_orderkey % 500 = 0),
      m AS (
        SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure,
               CAST(l_quantity AS DOUBLE) AS value FROM f
        UNION ALL SELECT l_orderkey, l_linenumber, 'l_extendedprice',
               CAST(l_extendedprice AS DOUBLE) FROM f
        UNION ALL SELECT l_orderkey, l_linenumber, 'l_discount',
               CAST(l_discount AS DOUBLE) FROM f
        UNION ALL SELECT l_orderkey, l_linenumber, 'l_tax',
               CAST(l_tax AS DOUBLE) FROM f)
      SELECT l_orderkey, l_linenumber, measure, value
      FROM m ORDER BY l_orderkey, l_linenumber, measure"""))

  val qEquidepth = GraftQuery(
    "q114_equidepth_bins",
    (s, dir) => equidepthHistogram(Tables.lineitem(s, dir), k = 10),
    Some("""
      WITH counts AS (
        SELECT l_returnflag AS grp, l_quantity AS v, count(*) AS c
        FROM lineitem GROUP BY grp, v),
      cum AS (
        SELECT grp, v, c,
               sum(c) OVER (PARTITION BY grp ORDER BY v
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
               sum(c) OVER (PARTITION BY grp) AS n
        FROM counts)
      SELECT grp, CAST(floor((cum - 1) * 10 / n) AS BIGINT) AS bucket,
             CAST(sum(c) AS BIGINT) AS n_rows, min(v) AS lo, max(v) AS hi
      FROM cum GROUP BY grp, bucket
      ORDER BY grp, bucket"""))

  val qGroupingSets = GraftQuery(
    "q164_grouping_sets",
    (s, dir) => segmentPriorityGroupingSets(
      Tables.orders(s, dir), Tables.customer(s, dir)),
    Some("""
      SELECT c_mktsegment AS segment, o_orderpriority AS priority,
             CAST(GROUPING(c_mktsegment, o_orderpriority) AS BIGINT) AS gid,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS revenue,
             count(*) AS n_orders
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY GROUPING SETS ((c_mktsegment, o_orderpriority),
                              (c_mktsegment), (o_orderpriority))
      ORDER BY gid, segment, priority"""))

  val queries: Seq[GraftQuery] =
    Seq(qRollup, qPivot, qHistogram, qUnpivot, qEquidepth, qGroupingSets)
}
