package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every implemented operator's verifiable query
  * (one per SURVEY.md §2 operator cluster); `oracleSql` carries the
  * DuckDB-equivalent SQL for each. Modules register via [[QueryModule]].
  */
object SparkEntry {

  private val modules: Seq[QueryModule] = Seq(
    graft.operators.RelationalQueries,
    graft.operators.WindowQueries,
    graft.operators.DmlQueries,
    graft.operators.AnalyticsQueries,
    graft.operators.SketchQueries,
    graft.operators.ZOrderQueries,
    graft.operators.RegressionQueries,
    graft.operators.ClassifierQueries,
    graft.operators.NaiveBayesQueries,
    graft.operators.MulticlassNb,
    graft.operators.QuantileSketchQueries,
    graft.operators.TreeQueries,
    graft.operators.RecommenderQueries,
    graft.operators.SurvivalQueries,
    graft.operators.ForecastQueries,
    graft.operators.GraphQueries,
    graft.functions.ScalarQueries,
    graft.functions.TextQueries,
    graft.functions.DedupQueries,
    graft.functions.CorpusBuildQueries,
    graft.functions.SimilarityQueries,
    graft.functions.ClusteringQueries,
    graft.streaming.StreamingQueries,
    graft.sources.Multimodal,
    graft.sources.TextFormats,
    graft.etl.FeatureQueries
  )

  private lazy val all: Map[String, QueryDef] =
    modules.flatMap(_.queries).toMap

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The dashboard headline KPI (SURVEY §7 minimum slice): revenue by
    * market segment with dim joins, quality-filterable and broadcast-
    * friendly.
    */
  def entry(spark: SparkSession): DataFrame =
    all("q05_join_multiway").fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (k, v) => k -> v.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted entries get a rows-only check.
    */
  def oracleSql: Map[String, String] =
    all.collect { case (k, QueryDef(_, Some(sql))) => k -> sql.trim }
}
