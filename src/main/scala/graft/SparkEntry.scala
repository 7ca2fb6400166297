package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the engine's full declared surface (one entry per
  * implemented operator from SURVEY §2 plus the large-scale extension
  * operators); `oracleSql` carries a DuckDB-equivalent statement for
  * every SQL-expressible query, with identical output column names.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    GraftSession.prepare(spark)
    RelationalQueries.regionalRevenue(spark, "/root/testdata/sf0.001")
  }

  private def packs: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (ParityQueries.defs, ParityQueries.oracles),
      (RelationalQueries.defs, RelationalQueries.oracles),
      (AnalyticsQueries.defs, AnalyticsQueries.oracles),
      (TextQueries.defs, TextQueries.oracles),
      (SimilarityQueries.defs, SimilarityQueries.oracles),
      (MetarQueries.defs, MetarQueries.oracles),
      (PipelineQueries.defs, PipelineQueries.oracles),
      (OpsQueries.defs, OpsQueries.oracles),
      (SetOpQueries.defs, SetOpQueries.oracles),
      (SqlQueries.defs, SqlQueries.oracles),
      (ScalarQueries.defs, ScalarQueries.oracles))

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.map(_._1).reduce(_ ++ _).map { case (name, fn) =>
      name -> { (spark: SparkSession, dir: String) =>
        GraftSession.prepare(spark)
        fn(spark, dir)
      }
    }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = packs.map(_._2).reduce(_ ++ _)
}
