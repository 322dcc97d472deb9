package graft.relational

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end entity resolution: blocking → pairwise Jaro-Winkler match →
  * transitive closure → golden record per resolved entity. The composite
  * every master-data / catalog-dedup pipeline runs, assembled from the
  * engine's own primitives (the q105/q150 blocking shape, the native
  * [[graft.text.JaroWinkler]] kernel, and the alternating-star connected
  * components from the dedup family).
  *
  * Scale shape: candidate pairs are block-bounded (never all-pairs), the
  * kernel runs once per distinct in-block name pair behind an aggregate
  * barrier, and the closure is the O(log n)-round large/small-star loop
  * with per-round localCheckpoint — identical machinery to q51, which the
  * 100 TB audit already cleared. A record's block key is a function of its
  * own row, so components never span blocks and stay catalog-constant.
  */
object EntityResolution {

  /** Resolved entities over part: (entity_id = min member key, n_members,
    * n_names, golden_name = the entity_id member's name).
    *
    * Match rule: same (last-name-token, brand) block AND Jaro-Winkler ≥
    * minSim — equal names match trivially (similarity 1), so exact
    * duplicates and near-misses resolve through the same path.
    */
  def resolveEntities(part: DataFrame, minSim: Double): DataFrame = {
    require(minSim > 0.0 && minSim <= 1.0, s"minSim in (0,1], got $minSim")
    val p = part.select(
      element_at(split(col("p_name"), " "), -1).as("blk_tok"),
      col("p_brand").as("blk_brand"),
      col("p_partkey"), col("p_name"))
    val names = p.select(col("blk_tok"), col("blk_brand"), col("p_name")).distinct()
    val pairSim = names.select(col("blk_tok"), col("blk_brand"), col("p_name").as("name_a"))
      .join(names.select(col("blk_tok"), col("blk_brand"), col("p_name").as("name_b")),
        Seq("blk_tok", "blk_brand"))
      .select(col("name_a"), col("name_b")).distinct()
      .filter(col("name_a") === col("name_b") ||
        graft.text.JaroWinkler.jaroWinkler(col("name_a"), col("name_b")) >= minSim)
      .select(col("name_a"), col("name_b"))
    val a = p.select(col("blk_tok"), col("blk_brand"),
      col("p_partkey").as("src"), col("p_name").as("name_a"))
    val b = p.select(col("blk_tok"), col("blk_brand"),
      col("p_partkey").as("dst"), col("p_name").as("name_b"))
    val edges = a.join(b, Seq("blk_tok", "blk_brand"))
      .filter(col("src") < col("dst"))
      .join(pairSim, Seq("name_a", "name_b"))
      .select(col("src"), col("dst"))
    val cc = graft.text.TextDedup.connectedComponents(
      p.select(col("p_partkey").as("doc_id")), edges)
    cc.join(p.select(col("p_partkey").as("doc_id"), col("p_name")), Seq("doc_id"))
      .groupBy(col("cluster_id"))
      .agg(
        count(lit(1)).as("n_members"),
        count_distinct(col("p_name")).as("n_names"),
        max(when(col("doc_id") === col("cluster_id"), col("p_name"))).as("golden_name"))
      .select(col("cluster_id").as("entity_id"), col("n_members"),
        col("n_names"), col("golden_name"))
      .orderBy(col("entity_id"))
  }

  // ---- queries -------------------------------------------------------------

  val qEntities = GraftQuery(
    "q157_entity_resolution",
    (s, dir) => resolveEntities(Tables.part(s, dir), minSim = 0.95),
    Some("""
      WITH RECURSIVE p AS (
        SELECT string_split(p_name, ' ')[-1] AS blk_tok, p_brand AS blk_brand,
               p_partkey, p_name
        FROM part),
      edges AS (
        SELECT a.p_partkey AS src, b.p_partkey AS dst
        FROM p a JOIN p b
          ON a.blk_tok = b.blk_tok AND a.blk_brand = b.blk_brand
         AND a.p_partkey < b.p_partkey
         AND (a.p_name = b.p_name
              OR jaro_winkler_similarity(a.p_name, b.p_name) >= 0.95)),
      sym AS (SELECT src AS u, dst AS v FROM edges
              UNION SELECT dst AS u, src AS v FROM edges),
      reach AS (
        SELECT u, v FROM sym
        UNION
        SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u WHERE s.v <> r.u),
      labels AS (SELECT u AS id, min(v) AS mn FROM reach GROUP BY u),
      comp AS (
        SELECT p.p_partkey AS id, p.p_name,
               CASE WHEN l.mn IS NULL OR l.mn > p.p_partkey THEN p.p_partkey
                    ELSE l.mn END AS entity_id
        FROM p LEFT JOIN labels l ON p.p_partkey = l.id)
      SELECT c.entity_id,
             count(*) AS n_members,
             count(DISTINCT c.p_name) AS n_names,
             max(CASE WHEN c.id = c.entity_id THEN c.p_name END) AS golden_name
      FROM comp c
      GROUP BY c.entity_id
      ORDER BY c.entity_id"""))

  val queries: Seq[GraftQuery] = Seq(qEntities)
}
