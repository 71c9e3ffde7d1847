package graft

import graft.analytics.{CdcQueries, DedupQueries, EventQueries, GraphQueries, MultimodalQueries, PipelineQueries, PrepQueries, RelationalQueries, SimilarityQueries, TextQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Every operator family from SURVEY.md §2 is exposed as a named query
  * with (where SQL-expressible) a DuckDB oracle on the same parquet. */
object SparkEntry {

  private def registries = Seq(RelationalQueries.all, PipelineQueries.all,
    DedupQueries.all, SimilarityQueries.all, TextQueries.all,
    MultimodalQueries.all, PrepQueries.all, GraphQueries.all,
    EventQueries.all, CdcQueries.all)

  private lazy val queryList: Seq[RelationalQueries.Q] = registries.flatten

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. The full reference pipeline driven end-to-end is the
    * flagship capability. */
  def entry(spark: SparkSession): DataFrame =
    PipelineQueries.qDnsPipelineFull.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    queryList.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    queryList.flatMap(q => q.oracle.map(o => q.name -> o.trim)).toMap
}
