package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the engine's full declared capability surface; every entry
  * with an `oracleSql` is hash-checked against DuckDB over the same parquet
  * (the driver's t2 gate), the rest get a rows-only check and have ScalaTest
  * specs asserting semantics.
  */
object SparkEntry {

  /** All registered capabilities, one GraftQuery per operator. */
  def registry: Seq[GraftQuery] =
    relational.RelationalQueries.all ++
      relational.ExtendedQueries.all ++
      relational.SessionQueries.all ++
      relational.SetOpQueries.all ++
      relational.SnapshotDelta.queries ++
      relational.BloomJoin.queries ++
      relational.SkewTools.queries ++
      relational.ZOrder.queries ++
      relational.Funnels.queries ++
      relational.Olap.queries ++
      relational.Cdc.queries ++
      relational.TimeSeries.queries ++
      relational.Islands.queries ++
      relational.Bootstrap.queries ++
      relational.Proration.queries ++
      relational.Seasonal.queries ++
      relational.TopPaths.queries ++
      relational.Profiling.queries ++
      relational.FuzzyJoin.queries ++
      relational.Skyline.queries ++
      relational.Bucketing.queries ++
      relational.EntityResolution.queries ++
      text.Topics.queries ++
      relational.Distributions.queries ++
      relational.Paths.queries ++
      relational.SemiStructured.queries ++
      relational.Regression.queries ++
      relational.SqlSurface.queries ++
      relational.AbTest.queries ++
      relational.Reconcile.queries ++
      relational.Growth.queries ++
      relational.ShareReport.queries ++
      relational.Temporal.queries ++
      relational.Transitions.queries ++
      text.Readability.queries ++
      relational.Attribution.queries ++
      relational.Quantiles.queries ++
      relational.Basket.queries ++
      relational.Quality.queries ++
      relational.PageRank.queries ++
      relational.Triangles.queries ++
      relational.Communities.queries ++
      text.TextAnalysis.queries ++
      text.TextDedup.queries ++
      text.LineDedup.queries ++
      text.LmScore.queries ++
      text.InvertedIndex.queries ++
      text.QuantileNorm.queries ++
      text.Collocations.queries ++
      text.Mixture.queries ++
      text.Repetition.queries ++
      text.CorpusPrep.queries ++
      text.CorpusOps.queries ++
      text.CorpusBudget.queries ++
      text.FilterCascade.queries ++
      text.Sharding.queries ++
      text.SftPairs.queries ++
      text.CorpusCard.queries ++
      text.HeavyHitters.queries ++
      text.CorpusSafety.queries ++
      text.Bpe.queries ++
      text.TrainingBatch.queries ++
      text.PrefixJoin.queries ++
      relational.RangeJoin.queries ++
      vector.Similarity.queries ++
      vector.IvfIndex.queries ++
      vector.Outliers.queries ++
      vector.Quantize.queries ++
      vector.Centroids.queries ++
      vector.SemDedup.queries ++
      vector.Pca.queries ++
      vector.PrCurve.queries ++
      vector.NegativeSampling.queries ++
      text.SqlFunctions.queries ++
      vector.Mmr.queries ++
      sources.CsvFolderSource.queries ++
      wrm.WrmQueries.queries ++
      multimodal.Multimodal.queries ++
      streaming.EventsStream.queries ++
      streaming.DocsStream.queries ++
      plans.AsOfQueries.queries

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    relational.RelationalQueries.q01.run(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(o => q.name -> o.trim)).toMap
}
