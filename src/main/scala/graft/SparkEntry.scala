package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the union of every operator module's query map; each key
  * has a DuckDB-runnable oracle in `oracleSql` (omitted only for ops whose
  * semantics are not SQL-expressible — those are covered by ScalaTest).
  */
object SparkEntry {

  private val modules: Seq[(Map[String, (SparkSession, String) => DataFrame],
                            Map[String, String])] = Seq(
    (ops.Candles.queries, ops.Candles.oracles),
    (ops.Parse.queries, ops.Parse.oracles),
    (ops.Maps.queries, ops.Maps.oracles),
    (ops.Arrays.queries, ops.Arrays.oracles),
    (ops.OrderFlow.queries, ops.OrderFlow.oracles),
    (ops.Scalars.queries, ops.Scalars.oracles),
    (ops.Rollups.queries, ops.Rollups.oracles),
    (ops.Export.queries, ops.Export.oracles),
    (ops.Joins.queries, ops.Joins.oracles),
    (ops.TimeJoins.queries, ops.TimeJoins.oracles),
    (ops.Grouping.queries, ops.Grouping.oracles),
    (ops.Bucketing.queries, ops.Bucketing.oracles),
    (ops.BloomJoin.queries, ops.BloomJoin.oracles),
    (ops.Quality.queries, ops.Quality.oracles),
    (ops.Stats.queries, ops.Stats.oracles),
    (ops.SetOps.queries, ops.SetOps.oracles),
    (ops.Sessionize.queries, ops.Sessionize.oracles),
    (ops.Cdc.queries, ops.Cdc.oracles),
    (ops.Layout.queries, ops.Layout.oracles),
    (ops.ZOrder.queries, ops.ZOrder.oracles),
    (ops.TypedAgg.queries, ops.TypedAgg.oracles),
    (ops.Windows.queries, ops.Windows.oracles),
    (ops.Incremental.queries, ops.Incremental.oracles),
    (ext.Text.queries, ext.Text.oracles),
    (ext.LangModel.queries, ext.LangModel.oracles),
    (ext.Funnel.queries, ext.Funnel.oracles),
    (ext.Bpe.queries, ext.Bpe.oracles),
    (ext.Unigram.queries, ext.Unigram.oracles),
    (ext.Card.queries, ext.Card.oracles),
    (ext.KMeans.queries, ext.KMeans.oracles),
    (ext.Pq.queries, ext.Pq.oracles),
    (ext.IvfPq.queries, ext.IvfPq.oracles),
    (ext.Opq.queries, ext.Opq.oracles),
    (ext.Corpus.queries, ext.Corpus.oracles),
    (ext.Dedup.queries, ext.Dedup.oracles),
    (ext.DedupHistory.queries, ext.DedupHistory.oracles),
    (ext.EmbHistory.queries, ext.EmbHistory.oracles),
    (ext.Cluster.queries, ext.Cluster.oracles),
    (ext.Similarity.queries, ext.Similarity.oracles),
    (ext.SemDedup.queries, ext.SemDedup.oracles),
    (ext.Scoring.queries, ext.Scoring.oracles),
    (ext.Classifier.queries, ext.Classifier.oracles),
    (ext.Sketch.queries, ext.Sketch.oracles),
    (ext.Multimodal.queries, ext.Multimodal.oracles),
    (ext.Privacy.queries, ext.Privacy.oracles),
    (ext.Decontam.queries, ext.Decontam.oracles),
    (ext.Relevance.queries, ext.Relevance.oracles),
    (ext.FuzzyJoin.queries, ext.FuzzyJoin.oracles),
    (ext.Curation.queries, ext.Curation.oracles),
    (ext.Urls.queries, ext.Urls.oracles),
    (ext.Graph.queries, ext.Graph.oracles)
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The full §3.1 chain: wire JSON → parse → explode → classify →
    * windowed orderflow candles — the engine's core capability in one
    * plan. */
  def entry(spark: SparkSession): DataFrame =
    ops.OrderFlow.orderflowCandles1m(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.iterator.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.iterator.map(_._2).reduce(_ ++ _)
}
