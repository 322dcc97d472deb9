package graft.relational

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket co-occurrence: pairs of parts appearing in the same order,
  * with support counts — the candidate-generation step of association-rule
  * mining (and the bipartite-projection primitive behind "customers who
  * bought X also bought Y").
  *
  * Scale shape: the self-join is keyed on the ORDER id, so the pair
  * expansion per order is bounded by basket size squared — a data-model
  * constant (TPC-H ≤ 7 lineitems/order; retail baskets tens) — never a
  * corpus-size term. The (a, b) count aggregate is map-side combinable and
  * its output is the co-occurrence matrix itself. a < b keeps each
  * unordered pair once.
  */
object Basket {

  /** Unordered co-purchase pairs — the graph-construction form. The graph
    * operators (q93-q95, q106) consume this and `localCheckpoint` it, so a
    * presentation sort here would be materialized as a real range shuffle
    * the consumer never needed; output order is left to the caller.
    */
  def copurchasePairsUnsorted(lineitem: DataFrame, minSupport: Long): DataFrame = {
    require(minSupport >= 1, s"minSupport must be >= 1, got $minSupport")
    // distinct first: multiple lineitems of the same part in one order are
    // one basket membership, not several
    val items = lineitem.select(col("l_orderkey"), col("l_partkey")).distinct()
    val a = items.select(col("l_orderkey"), col("l_partkey").as("part_a"))
    val b = items.select(col("l_orderkey"), col("l_partkey").as("part_b"))
    a.join(b, Seq("l_orderkey"))
      .filter(col("part_a") < col("part_b"))
      .groupBy(col("part_a"), col("part_b"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
  }

  def copurchasePairs(lineitem: DataFrame, minSupport: Long): DataFrame =
    copurchasePairsUnsorted(lineitem, minSupport)
      .orderBy(col("support").desc, col("part_a"), col("part_b"))

  // ---- queries -------------------------------------------------------------

  val qCopurchase = GraftQuery(
    "q87_copurchase",
    (s, dir) => copurchasePairs(Tables.lineitem(s, dir), minSupport = 2),
    Some("""
      WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             count(*) AS support
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY part_a, part_b
      HAVING count(*) >= 2
      ORDER BY support DESC, part_a, part_b"""))

  /** Top-k recommendations per item ("customers also bought"): the
    * symmetric co-purchase neighbors of each part ranked by support with
    * a deterministic (support DESC, neighbor ASC) tie-break — the
    * serving table an item-to-item recommender precomputes.
    *
    * Scale shape: the q87 pair aggregate is the only corpus-scale work;
    * the rank window partitions on the item over its own neighbor rows
    * (bounded by the item's co-purchase degree, never corpus size), and
    * WindowGroupLimit pushes the rn <= k filter below the sort.
    */
  def alsoBought(lineitem: DataFrame, minSupport: Long, k: Int): DataFrame = {
    require(k >= 1, s"alsoBought needs k >= 1, got $k")
    val pairs = copurchasePairsUnsorted(lineitem, minSupport)
    val sym = pairs
      .select(col("part_a").as("item"), col("part_b").as("rec"), col("support"))
      .unionAll(pairs
        .select(col("part_b").as("item"), col("part_a").as("rec"), col("support")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("item")).orderBy(col("support").desc, col("rec"))
    sym.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .orderBy(col("item"), col("rank"))
  }

  val qAlsoBought = GraftQuery(
    "q138_also_bought",
    (s, dir) => alsoBought(Tables.lineitem(s, dir), minSupport = 2, k = 3),
    Some("""
      WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      pairs AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               count(*) AS support
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY part_a, part_b
        HAVING count(*) >= 2),
      sym AS (
        SELECT part_a AS item, part_b AS rec, support FROM pairs
        UNION ALL
        SELECT part_b AS item, part_a AS rec, support FROM pairs),
      ranked AS (
        SELECT item, rec, CAST(support AS BIGINT) AS support,
               CAST(row_number() OVER (PARTITION BY item
                 ORDER BY support DESC, rec) AS INT) AS rank
        FROM sym)
      SELECT item, rec, support, rank
      FROM ranked WHERE rank <= 3
      ORDER BY item, rank"""))

  /** Association-rule lift for co-purchase pairs:
    * lift(A,B) = P(A,B) / (P(A)·P(B)) over baskets — >1 means the pair
    * attracts, <1 repels; the score that separates "popular with
    * everything" from "actually bought together".
    *
    * Scale shape: q87's pair aggregate + one per-part basket-count
    * aggregate joined in twice (slim key+count projections, AQE
    * broadcasts them), one 1-row basket total. Every probability
    * divides exact BIGINTs, so lift is engine-identical.
    */
  def pairLift(lineitem: DataFrame, minSupport: Long): DataFrame = {
    val items = lineitem.select(col("l_orderkey"), col("l_partkey")).distinct()
      .localCheckpoint() // referenced three times (pairs + two margins)
    val pairs = {
      val a = items.select(col("l_orderkey"), col("l_partkey").as("part_a"))
      val b = items.select(col("l_orderkey"), col("l_partkey").as("part_b"))
      a.join(b, Seq("l_orderkey"))
        .filter(col("part_a") < col("part_b"))
        .groupBy(col("part_a"), col("part_b"))
        .agg(count(lit(1)).as("support"))
        .filter(col("support") >= minSupport)
    }
    val perPart = items.groupBy(col("l_partkey")).agg(count(lit(1)).as("n_part"))
    val totals = items.select(col("l_orderkey")).distinct()
      .agg(count(lit(1)).as("n_baskets"))
    pairs
      .join(perPart.select(col("l_partkey").as("part_a"),
        col("n_part").as("n_a")), Seq("part_a"))
      .join(perPart.select(col("l_partkey").as("part_b"),
        col("n_part").as("n_b")), Seq("part_b"))
      .crossJoin(broadcast(totals))
      .select(col("part_a"), col("part_b"), col("support"),
        ((col("support").cast("double") * col("n_baskets").cast("double")) /
          (col("n_a").cast("double") * col("n_b").cast("double"))).as("lift"))
      .orderBy(col("part_a"), col("part_b"))
  }

  val qPairLift = GraftQuery(
    "q146_pair_lift",
    (s, dir) => pairLift(Tables.lineitem(s, dir), minSupport = 3),
    Some("""
      WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      pairs AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               count(*) AS support
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY part_a, part_b
        HAVING count(*) >= 3),
      per_part AS (SELECT l_partkey, count(*) AS n_part FROM items GROUP BY l_partkey),
      totals AS (SELECT count(DISTINCT l_orderkey) AS n_baskets FROM items)
      SELECT p.part_a, p.part_b, CAST(p.support AS BIGINT) AS support,
             (CAST(p.support AS DOUBLE) * CAST(t.n_baskets AS DOUBLE)) /
               (CAST(pa.n_part AS DOUBLE) * CAST(pb.n_part AS DOUBLE)) AS lift
      FROM pairs p
      JOIN per_part pa ON p.part_a = pa.l_partkey
      JOIN per_part pb ON p.part_b = pb.l_partkey
      CROSS JOIN totals t
      ORDER BY part_a, part_b"""))

  /** Full directed association rules A→B over co-purchase pairs:
    * confidence = P(B|A), lift, and conviction = (1−P(B))/(1−conf) —
    * the complete rule-mining metric set (conviction separates
    * "confident because B is everywhere" from real implication; it is
    * null for exact rules, where the denominator vanishes).
    *
    * Scale shape: identical to [[pairLift]] (one pair aggregate + slim
    * margin joins + a 1-row total); the symmetric expansion to directed
    * rules doubles only the O(pairs) aggregate, never basket rows.
    * Probabilities divide exact BIGINTs in a fixed order, so every
    * metric is engine-identical.
    */
  def assocRules(lineitem: DataFrame, minSupport: Long): DataFrame = {
    val items = lineitem.select(col("l_orderkey"), col("l_partkey")).distinct()
      .localCheckpoint() // referenced three times (pairs + margins + total)
    val pairs = {
      val a = items.select(col("l_orderkey"), col("l_partkey").as("part_a"))
      val b = items.select(col("l_orderkey"), col("l_partkey").as("part_b"))
      a.join(b, Seq("l_orderkey"))
        .filter(col("part_a") < col("part_b"))
        .groupBy(col("part_a"), col("part_b"))
        .agg(count(lit(1)).as("support"))
        .filter(col("support") >= minSupport)
    }
    val sym = pairs
      .select(col("part_a").as("antecedent"), col("part_b").as("consequent"),
        col("support"))
      .unionAll(pairs.select(col("part_b").as("antecedent"),
        col("part_a").as("consequent"), col("support")))
    val perPart = items.groupBy(col("l_partkey")).agg(count(lit(1)).as("n_part"))
    val totals = items.select(col("l_orderkey")).distinct()
      .agg(count(lit(1)).as("n_baskets"))
    val conf = col("support").cast("double") / col("n_a").cast("double")
    val pB = col("n_c").cast("double") / col("n_baskets").cast("double")
    sym
      .join(perPart.select(col("l_partkey").as("antecedent"),
        col("n_part").as("n_a")), Seq("antecedent"))
      .join(perPart.select(col("l_partkey").as("consequent"),
        col("n_part").as("n_c")), Seq("consequent"))
      .crossJoin(broadcast(totals))
      .select(col("antecedent"), col("consequent"), col("support"),
        round(conf, 6).as("confidence"),
        round((col("support").cast("double") * col("n_baskets").cast("double")) /
          (col("n_a").cast("double") * col("n_c").cast("double")), 6).as("lift"),
        when(col("support") === col("n_a"), lit(null).cast("double"))
          .otherwise(round((lit(1.0) - pB) / (lit(1.0) - conf), 6))
          .as("conviction"))
      .orderBy(col("antecedent"), col("consequent"))
  }

  val qAssocRules = GraftQuery(
    "q176_assoc_rules",
    (s, dir) => assocRules(Tables.lineitem(s, dir), minSupport = 3),
    Some("""
      WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      pairs AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               count(*) AS support
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY part_a, part_b
        HAVING count(*) >= 3),
      sym AS (
        SELECT part_a AS antecedent, part_b AS consequent, support FROM pairs
        UNION ALL
        SELECT part_b, part_a, support FROM pairs),
      per_part AS (SELECT l_partkey, count(*) AS n_part FROM items
                   GROUP BY l_partkey),
      totals AS (SELECT count(DISTINCT l_orderkey) AS n_baskets FROM items)
      SELECT s.antecedent, s.consequent, CAST(s.support AS BIGINT) AS support,
             round(CAST(s.support AS DOUBLE) / CAST(pa.n_part AS DOUBLE), 6)
               AS confidence,
             round((CAST(s.support AS DOUBLE) * CAST(t.n_baskets AS DOUBLE))
                   / (CAST(pa.n_part AS DOUBLE) * CAST(pc.n_part AS DOUBLE)),
                   6) AS lift,
             CASE WHEN s.support = pa.n_part THEN NULL
                  ELSE round((1.0 - CAST(pc.n_part AS DOUBLE)
                                / CAST(t.n_baskets AS DOUBLE))
                             / (1.0 - CAST(s.support AS DOUBLE)
                                / CAST(pa.n_part AS DOUBLE)), 6)
             END AS conviction
      FROM sym s
      JOIN per_part pa ON s.antecedent = pa.l_partkey
      JOIN per_part pc ON s.consequent = pc.l_partkey
      CROSS JOIN totals t
      ORDER BY antecedent, consequent"""))

  val queries: Seq[GraftQuery] =
    Seq(qCopurchase, qAlsoBought, qPairLift, qAssocRules)
}
