package graft.text

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mixture resampling: downsample a multi-source corpus so the KEPT set
  * matches target source proportions — the data-mixing step every LLM
  * training recipe specifies ("w% web, x% code, y% books…"). The largest
  * achievable total is scale = min_s(c_s / w_s); each source keeps
  * fraction w_s·scale/c_s of its docs, selected by the deterministic
  * md5-hash uniform (the q47 idiom) so the exact kept set is reproducible
  * across engines, partitionings and reruns.
  *
  * Scale shape: one per-source count aggregate (O(sources) rows), a 1-row
  * global min broadcast, one unhinted docs⋈counts join (AQE broadcasts
  * the count table when the source domain is small), and a narrow hash
  * filter. No collect, no windows.
  */
object Mixture {

  /** targets: source → weight (> 0; weights are ratios, any scale).
    * Sources not in `targets` are dropped.
    */
  def mixtureResample(docs: DataFrame, targets: Map[String, Double]): DataFrame = {
    require(targets.nonEmpty, "targets must be non-empty")
    require(targets.values.forall(_ > 0), s"target weights must be > 0: $targets")
    val wcol = targets.foldLeft(lit(0.0)) { case (acc, (k, w)) =>
      when(col("source") === k, lit(w)).otherwise(acc)
    }
    val counts = docs.groupBy(col("source")).agg(count(lit(1)).as("c"))
    val scale = counts.withColumn("wgt", wcol).filter(col("wgt") > 0)
      .agg(min(col("c") / col("wgt")).as("scale"))
    val u = pmod(conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
      .cast("long"), lit(1000000L)).cast("double") / 1000000.0
    docs.join(counts, Seq("source"))
      .crossJoin(broadcast(scale))
      .withColumn("wgt", wcol)
      .filter(col("wgt") > 0 && u < (col("wgt") * col("scale")) / col("c"))
      .select(col("doc_id"), col("source"))
      .orderBy(col("doc_id"))
  }

  /** Per-language source-concentration card: how dominated each language
    * slice is by its biggest sources — the mixture-audit companion to
    * [[mixtureResample]] (a language whose effective source count is ~1 is
    * a single-crawl monoculture however many rows it has). Reports the
    * top-source share, the Herfindahl index Σpᵢ², and its inverse (the
    * "effective number of sources").
    *
    * Scale shape: one (lang, source) count aggregate, then an O(langs ×
    * sources) reduction — both partial-aggregate map-side; no windows, no
    * per-row work after the first groupBy. Determinism: every input to the
    * double divisions is an exact BIGINT (counts and Σc² — never a float
    * sum), so the derived ratios are bit-identical across engines and
    * partitionings; a float Σp·ln p entropy would not be, which is why the
    * card uses the Herfindahl family.
    */
  def sourceDiversity(docs: DataFrame): DataFrame =
    docs.groupBy(col("lang"), col("source")).agg(count(lit(1)).as("c"))
      .groupBy(col("lang"))
      .agg(
        sum(col("c")).as("n_docs"),
        count(lit(1)).as("n_sources"),
        sum(col("c") * col("c")).as("sum_c2"),
        max(col("c")).as("max_c"))
      .select(col("lang"), col("n_docs"), col("n_sources"),
        (col("max_c").cast("double") / col("n_docs").cast("double"))
          .as("top_share"),
        (col("sum_c2").cast("double") /
          (col("n_docs").cast("double") * col("n_docs").cast("double")))
          .as("hhi"),
        ((col("n_docs").cast("double") * col("n_docs").cast("double")) /
          col("sum_c2").cast("double")).as("effective_sources"))
      .orderBy(col("lang"))

  // ---- queries -------------------------------------------------------------

  /** q96: rebalance the 20-source corpus to weight 3 for src0/src1 and 1
    * for the rest — the oracle recomputes counts, scale and the identical
    * md5 uniform.
    */
  private val Targets: Map[String, Double] =
    (0 until 20).map(i => s"src$i" -> (if (i < 2) 3.0 else 1.0)).toMap

  private def duckWgt(src: String): String =
    s"CASE WHEN $src IN ('src0','src1') THEN 3.0 ELSE 1.0 END"

  val qMixture = GraftQuery(
    "q96_mixture_resample",
    (s, dir) => mixtureResample(Tables.documents(s, dir), Targets),
    Some(s"""
      WITH counts AS (SELECT source, count(*) AS c FROM documents GROUP BY source),
      sc AS (
        SELECT min(c / CAST(${duckWgt("source")} AS DOUBLE)) AS scale
        FROM counts),
      u AS (
        SELECT doc_id, source,
               CAST(${Md5P61.duckBase("CAST(doc_id AS VARCHAR)")} % 1000000
                    AS DOUBLE) / 1000000.0 AS u
        FROM documents)
      SELECT u.doc_id, u.source
      FROM u JOIN counts ON u.source = counts.source CROSS JOIN sc
      WHERE u.u < (CAST(${duckWgt("u.source")} AS DOUBLE) * sc.scale) / counts.c
      ORDER BY u.doc_id"""))

  val qDiversity = GraftQuery(
    "q122_source_diversity",
    (s, dir) => sourceDiversity(Tables.documents(s, dir)),
    Some("""
      WITH counts AS (
        SELECT lang, source, count(*) AS c
        FROM documents GROUP BY lang, source),
      agg AS (
        SELECT lang,
               CAST(sum(c) AS BIGINT) AS n_docs,
               CAST(count(*) AS BIGINT) AS n_sources,
               CAST(sum(c * c) AS BIGINT) AS sum_c2,
               CAST(max(c) AS BIGINT) AS max_c
        FROM counts GROUP BY lang)
      SELECT lang, n_docs, n_sources,
             CAST(max_c AS DOUBLE) / CAST(n_docs AS DOUBLE) AS top_share,
             CAST(sum_c2 AS DOUBLE) /
               (CAST(n_docs AS DOUBLE) * CAST(n_docs AS DOUBLE)) AS hhi,
             (CAST(n_docs AS DOUBLE) * CAST(n_docs AS DOUBLE)) /
               CAST(sum_c2 AS DOUBLE) AS effective_sources
      FROM agg ORDER BY lang"""))

  val queries: Seq[GraftQuery] = Seq(qMixture, qDiversity)
}
