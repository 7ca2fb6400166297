package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** SQL front-end surface: the same engine driven through `spark.sql`
  * over registered views — a user of the reference (whose entire
  * analytical layer is SQL text compiled by dbt, SURVEY §3 EP3) can
  * bring their SQL directly. Catalyst plans these identically to the
  * DataFrame formulations.
  */
object SqlQueries {

  type Q = (SparkSession, String) => DataFrame

  private def withViews(spark: SparkSession, dir: String, names: String*)(
      sql: String): DataFrame = {
    names.foreach(n => Tables.table(spark, dir, n).createOrReplaceTempView(n))
    spark.sql(sql)
  }

  /** The reference's dwh model as literal SQL (dialect-shared with the
    * oracle up to strftime/date_format).
    */
  def sqlDailyMart(spark: SparkSession, dir: String): DataFrame =
    withViews(spark, dir, "events")(
      """SELECT user_id,
        |  CAST(date_trunc('day', ts) AS DATE) AS day,
        |  round(avg(value), 4) AS avg_value,
        |  max(value) AS max_value,
        |  min(value) AS min_value,
        |  count(*) AS n_events,
        |  concat(CAST(user_id AS STRING), '_',
        |    date_format(CAST(date_trunc('day', ts) AS DATE), 'yyyyMMdd'))
        |    AS user_id_date
        |FROM events GROUP BY 1, 2 ORDER BY user_id, day""".stripMargin)

  /** Correlated scalar subquery (decorrelated by Catalyst): each
    * order's value share within its customer's total.
    */
  def sqlCorrelatedSubquery(spark: SparkSession, dir: String): DataFrame =
    withViews(spark, dir, "orders")(
      """SELECT o_orderkey, o_custkey,
        |  round(o_totalprice /
        |    (SELECT sum(o2.o_totalprice) FROM orders o2
        |     WHERE o2.o_custkey = orders.o_custkey), 6) AS share
        |FROM orders ORDER BY o_orderkey""".stripMargin)

  /** Explicit GROUPING SETS with grouping() markers (generalizes the
    * cube/rollup queries: arbitrary set lists in one pass).
    */
  def sqlGroupingSets(spark: SparkSession, dir: String): DataFrame =
    withViews(spark, dir, "customer")(
      """SELECT c_mktsegment, c_nationkey % 3 AS nation_grp,
        |  count(*) AS n_customers,
        |  CAST(grouping(c_mktsegment) AS BIGINT) AS g_seg,
        |  CAST(grouping(c_nationkey % 3) AS BIGINT) AS g_ng
        |FROM customer
        |GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey % 3), ())
        |ORDER BY g_seg, g_ng, c_mktsegment, nation_grp""".stripMargin)

  val defs: Map[String, Q] = Map(
    "sql_daily_mart" -> (sqlDailyMart _),
    "sql_grouping_sets" -> (sqlGroupingSets _),
    "sql_correlated_subquery" -> (sqlCorrelatedSubquery _))

  val oracles: Map[String, String] = Map(
    // identical to the DataFrame daily mart's oracle
    "sql_daily_mart" -> PipelineQueries.oracles("streaming_daily_metrics"),
    "sql_correlated_subquery" ->
      """SELECT o_orderkey, o_custkey,
        |  round(o_totalprice /
        |    (SELECT sum(o2.o_totalprice) FROM orders o2
        |     WHERE o2.o_custkey = orders.o_custkey), 6) AS share
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "sql_grouping_sets" ->
      """SELECT c_mktsegment, c_nationkey % 3 AS nation_grp,
        |  count(*) AS n_customers,
        |  CAST(grouping(c_mktsegment) AS BIGINT) AS g_seg,
        |  CAST(grouping(c_nationkey % 3) AS BIGINT) AS g_ng
        |FROM customer
        |GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey % 3), ())
        |ORDER BY g_seg, g_ng, c_mktsegment, nation_grp""".stripMargin)
}
