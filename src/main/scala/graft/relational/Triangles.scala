package graft.relational

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-node triangle counting — the third graph operator (after q51
  * connected components and q93 PageRank), the numerator of the local
  * clustering coefficient and the classic cohesion signal.
  *
  * The scale trick is DEGREE ORIENTATION: orient every undirected edge
  * from its lower-(degree, id) endpoint to the higher one, and enumerate
  * each triangle exactly once as two out-edges of its lowest vertex plus
  * the closing oriented edge. The wedge join's fan-out is then bounded by
  * the maximum ORIENTED out-degree — O(√m) for any graph — instead of the
  * raw degree of the hottest hub, which is what makes the self-join
  * survive a power-law graph at scale. All arithmetic is integer counts.
  */
object Triangles {

  /** edges: undirected (a, b), one row per edge, a ≠ b (either order).
    * Returns (node, n_triangles) for every node incident to an edge.
    */
  def triangleCounts(edges: DataFrame): DataFrame = {
    // `und` feeds deg + the orientation join and `oriented` is referenced
    // three times (two wedge sides + the closing edge): persist each once
    // so the upstream graph construction runs once, not 3×. LAZY
    // checkpoints (persist + lineage cut, no action): the final job
    // materializes the whole chain, where three eager checkpoints paid a
    // scheduling round-trip each before any real work started — within
    // the job, the first stage to compute a persisted partition caches
    // it and the other readers reuse it (the bfsHops pattern).
    val und = edges.select(least(col("a"), col("b")).as("a"),
      greatest(col("a"), col("b")).as("b")).distinct()
      .localCheckpoint(eager = false)
    val deg = und.select(col("a").as("node"))
      .unionAll(und.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("d"))
      .localCheckpoint(eager = false)

    val withDeg = und
      .join(deg.select(col("node").as("a"), col("d").as("da")), Seq("a"))
      .join(deg.select(col("node").as("b"), col("d").as("db")), Seq("b"))
    val lowFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val oriented = withDeg.select(
      when(lowFirst, col("a")).otherwise(col("b")).as("src"),
      when(lowFirst, col("b")).otherwise(col("a")).as("dst"),
      when(lowFirst, col("da")).otherwise(col("db")).as("ds"),
      when(lowFirst, col("db")).otherwise(col("da")).as("dd"))
      .localCheckpoint(eager = false)

    // wedges at the lowest vertex: two out-edges, second strictly above
    // the first in orientation order — each triangle enumerated once
    val e1 = oriented.select(col("src"), col("dst").as("b"), col("dd").as("db2"))
    val e2 = oriented.select(col("src"), col("dst").as("c"), col("dd").as("dc2"))
    val wedges = e1.join(e2, Seq("src"))
      .filter(col("db2") < col("dc2") ||
        (col("db2") === col("dc2") && col("b") < col("c")))
    val closing = oriented.select(col("src").as("b"), col("dst").as("c"))
    val tris = wedges.join(closing, Seq("b", "c"))
      .select(col("src").as("v1"), col("b").as("v2"), col("c").as("v3"))

    tris.select(explode(array(col("v1"), col("v2"), col("v3"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_triangles"))
      .join(deg.select(col("node")), Seq("node"), "right")
      .select(col("node"), coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
      .orderBy(col("node"))
  }

  // ---- queries -------------------------------------------------------------

  /** q94: triangles of the q87 co-purchase graph. AS MATERIALIZED on
    * und/deg/oriented is load-bearing (the Bpe-oracle rule): `oriented`
    * is referenced three times, so default CTE inlining re-expands the
    * whole graph-construction pipeline per reference — at sf1 DuckDB
    * spilled >60 GB of temp on the inlined form before being killed;
    * materialized, the oracle is tractable.
    */
  val qTriangles = GraftQuery(
    "q94_triangles",
    (s, dir) => {
      val pairs = Basket.copurchasePairsUnsorted(Tables.lineitem(s, dir), minSupport = 2)
      triangleCounts(pairs.select(col("part_a").as("a"), col("part_b").as("b")))
    },
    Some("""
      WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      und AS MATERIALIZED (
        SELECT a.l_partkey AS a, b.l_partkey AS b
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING count(*) >= 2),
      deg AS MATERIALIZED (
        SELECT node, count(*) AS d FROM (
          SELECT a AS node FROM und UNION ALL SELECT b FROM und)
        GROUP BY node),
      wd AS (
        SELECT u.a, u.b, da.d AS da, db.d AS db FROM und u
        JOIN deg da ON u.a = da.node JOIN deg db ON u.b = db.node),
      oriented AS MATERIALIZED (
        SELECT CASE WHEN da < db OR (da = db AND a < b) THEN a ELSE b END AS src,
               CASE WHEN da < db OR (da = db AND a < b) THEN b ELSE a END AS dst,
               CASE WHEN da < db OR (da = db AND a < b) THEN db ELSE da END AS dd
        FROM wd),
      tris AS (
        SELECT e1.src AS v1, e1.dst AS v2, e2.dst AS v3
        FROM oriented e1
        JOIN oriented e2 ON e1.src = e2.src
          AND (e1.dd < e2.dd OR (e1.dd = e2.dd AND e1.dst < e2.dst))
        JOIN oriented e3 ON e3.src = e1.dst AND e3.dst = e2.dst),
      pernode AS (
        SELECT node, count(*) AS n_triangles FROM (
          SELECT v1 AS node FROM tris
          UNION ALL SELECT v2 FROM tris
          UNION ALL SELECT v3 FROM tris)
        GROUP BY node)
      SELECT d.node, coalesce(p.n_triangles, 0) AS n_triangles
      FROM deg d LEFT JOIN pernode p ON d.node = p.node
      ORDER BY d.node"""))

  val queries: Seq[GraftQuery] = Seq(qTriangles)
}
