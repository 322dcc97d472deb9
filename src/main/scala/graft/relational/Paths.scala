package graft.relational

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-hop BFS: shortest hop distance from a seed set, the reachability
  * primitive behind "related items within k links" and taint/impact
  * analysis over entity graphs.
  *
  * Scale shape per round: one edges⋈dist equi-join on src plus a (node)
  * min-aggregate — O(edges) shuffled rows per round, never a transitive
  * closure blow-up; round count is the constant k. (A frontier-delta
  * variant would join only newly-discovered nodes — cheaper on high-
  * diameter graphs but the same asymptotic bound per round; on the dense
  * small-diameter graphs this targets, the relax form trades at most one
  * extra O(edges) round for a plan with no anti-join.) Distances are small
  * integers — partitioning-independent by min's commutativity, which is
  * also what makes the unrolled-CTE oracle exact. The oracle stages are
  * GENERATED FROM THE SAME LOOP as the Spark plan (the q83/q93 idiom).
  */
object Paths {

  val Hops = 3
  val SeedMod = 97

  /** edges: (src, dst) directed (pass both directions for undirected);
    * seeds: (node). Returns (node, dist) for every node within `hops`.
    *
    * `frontier = true` switches to the frontier-delta form: round i joins
    * only the nodes FIRST discovered in round i-1 (anti-joined against all
    * known nodes) instead of re-relaxing the whole dist set. Per-round
    * shuffle drops from O(edges incident to all known nodes) to O(edges
    * incident to the frontier) — the win on high-diameter graphs where the
    * frontier is a thin shell of the reachable set — and an empty frontier
    * short-circuits the remaining rounds. Both forms produce identical
    * (node, dist): BFS layers mean a node's first discovery round IS its
    * min hop distance (PathsSpec pins the equivalence differentially).
    */
  def bfsHops(edges: DataFrame, seeds: DataFrame, hops: Int,
              frontier: Boolean = false): DataFrame = {
    require(hops >= 1 && hops <= 10, s"hops must be in [1, 10], got $hops")
    // Persist the derived edge set once and cut per-round lineage: `dist`
    // is referenced twice per round (union + join), so without the cut the
    // unexecuted plan — including the co-purchase aggregate feeding
    // `edges` — roughly doubles per hop (~2^hops subtree copies). LAZY
    // checkpoints (persist + lineage cut, no action) keep single-execution
    // of every round while the whole relax loop runs as ONE job — the
    // eager per-round form paid a scheduling round-trip per hop, the
    // dominant cost of this operator at toy scale (the r16
    // scheduling-floor finding).
    val e = edges.localCheckpoint(eager = false)
    var dist = seeds.distinct().select(col("node"), lit(0).as("dist"))
      .localCheckpoint(eager = false)
    if (frontier) {
      var front = dist.select(col("node"))
      var i = 1
      while (i <= hops && !front.isEmpty) {
        // eager here: the loop's continue-condition is data-dependent, so
        // each round must materialize anyway — fold the emptiness check
        // into the checkpoint's own action instead of a separate scan
        val discovered = e.join(front, col("src") === col("node"))
          .select(col("dst").as("node")).distinct()
          .join(dist, Seq("node"), "left_anti")
          .localCheckpoint() // O(frontier) rows
        dist = dist.unionAll(discovered.select(col("node"), lit(i).as("dist")))
          .localCheckpoint(eager = false)
        front = discovered
        i += 1
      }
    } else {
      (1 to hops).foreach { i =>
        val relaxed = e.join(dist, col("src") === col("node"))
          .select(col("dst").as("node"), lit(i).as("dist"))
        dist = dist.unionAll(relaxed)
          .groupBy(col("node")).agg(min(col("dist")).as("dist"))
          .localCheckpoint(eager = false) // O(nodes) rows
      }
    }
    dist.orderBy(col("node"))
  }

  private def duckRounds(hops: Int): String =
    (1 to hops).map { i =>
      s"""d$i AS MATERIALIZED (
         |  SELECT node, min(dist) AS dist FROM (
         |    SELECT node, dist FROM d${i - 1}
         |    UNION ALL
         |    SELECT e.dst AS node, $i AS dist
         |    FROM edges e JOIN d${i - 1} p ON e.src = p.node)
         |  GROUP BY node)""".stripMargin
    }.mkString(",\n")

  // ---- queries -------------------------------------------------------------

  /** q106: hop distances from parts with key ≡ 0 (mod 97) over the
    * symmetric q87 co-purchase graph.
    */
  val qBfs = GraftQuery(
    "q106_bfs_hops",
    (s, dir) => {
      // lazy-checkpoint HERE, not just inside bfsHops: seeds also derive
      // from edges, and an unpersisted reference would execute the whole
      // co-purchase construction a second time just to pick seed nodes
      val edges = Basket.copurchaseEdges(Tables.lineitem(s, dir), minSupport = 2)
        .select(col("src"), col("dst"))
        .localCheckpoint(eager = false)
      val seeds = edges.select(col("src").as("node"))
        .filter(col("node") % SeedMod === 0)
      bfsHops(edges, seeds, Hops)
    },
    Some(s"""
      WITH items AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      pairs AS MATERIALIZED (
        SELECT a.l_partkey AS pa, b.l_partkey AS pb
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY pa, pb HAVING count(*) >= 2),
      edges AS MATERIALIZED (
        SELECT pa AS src, pb AS dst FROM pairs
        UNION ALL SELECT pb, pa FROM pairs),
      d0 AS MATERIALIZED (
        SELECT DISTINCT src AS node, 0 AS dist FROM edges
        WHERE src % $SeedMod = 0),
      ${duckRounds(Hops)}
      SELECT node, dist FROM d$Hops ORDER BY node"""))

  val queries: Seq[GraftQuery] = Seq(qBfs)
}
