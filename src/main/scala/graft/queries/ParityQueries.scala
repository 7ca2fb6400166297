package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{DailyRollup, Incremental, LatestPerKey, StageExtract}
import graft.quality.Checks

/** The reference pipeline's analytical surface (SURVEY §2) re-expressed
  * over the driver's `events` table, which stands in for the METAR
  * observation stream (`event_id`≈id, `user_id`≈icao, `ts`≈observed,
  * `props` JSON≈payload — mapping documented in
  * `/root/repo/FIXTURES.md` §B).
  *
  * Each query has a DuckDB oracle with identical output column names;
  * double-valued aggregates are rounded identically on both sides so
  * the driver's hash compare is insensitive to summation order.
  */
object ParityQueries {

  type Q = (SparkSession, String) => DataFrame

  /** stg layer: JSON field extraction + casts + date derivation
    * (SURVEY P6-P8, P11, P14).
    */
  def stageEvents(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    ev.select(
        col("event_id"), col("user_id"), col("event_type"), col("value"),
        to_date(date_trunc("day", col("ts"))).as("event_date"),
        StageExtract.jsonField(col("props"), "$.k").cast("int").as("k"))
      .orderBy("event_id")
  }

  /** ods layer: regex-guarded int cast + coalesce fallback + regex
    * filter (SURVEY P4, P9, F1).
    */
  def odsGuardedCast(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    // extract $.k ONCE into a named column before fan-out: inlining the
    // expression at each use re-parses the payload per occurrence
    // (get_json_object is per-field by design — the P9/F1 coverage this
    // query exists for — but that is no license to parse 4× per row;
    // the r15 stage split billed half the row's cost to repeated
    // parse/regex work). After the numeric filter the int cast needs
    // no WHEN guard: the filter IS the guard, same null-on-nonnumeric
    // contract, one regex evaluation instead of three.
    ev.select(
        col("event_id"),
        StageExtract.jsonField(col("props"), "$.k").as("_k"),
        col("event_type"), col("props"))
      .filter(col("_k").rlike("^[0-9]+$"))
      .select(
        col("event_id"),
        col("_k").cast("int").as("k_int"),
        StageExtract.guardedIntCast(col("event_type")).as("type_int"),
        coalesce(StageExtract.jsonField(col("props"), "$.missing"),
          col("_k")).as("k_fallback"),
        col("event_type"))
      .orderBy("event_id")
  }

  /** int layer: latest full row per key via `max_by` partial
    * aggregation (SURVEY A3/W1/F4) — no sort, one reduced row per key
    * per map partition crosses the shuffle.
    */
  def latestPerKey(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select("user_id", "ts", "event_id", "event_type", "value")
    LatestPerKey(ev, keys = Seq("user_id"), orderCols = Seq("ts", "event_id"))
      .select("user_id", "event_id", "event_type", "value")
      .orderBy("user_id")
  }

  /** dwh layer: daily per-key mart with AVG/MAX/MIN/COUNT and the
    * `key_yyyyMMdd` surrogate key (SURVEY A1, P13-P15).
    */
  def dailyMetrics(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    DailyRollup(ev, key = "user_id", tsCol = "ts", metrics = Seq(
        round(avg(col("value")), 4).as("avg_value"),
        max(col("value")).as("max_value"),
        min(col("value")).as("min_value"),
        count(lit(1)).as("n_events")))
      .orderBy("user_id", "day")
  }

  /** Incremental high-watermark tail (SURVEY F2/F3/A2): the scalar
    * watermark is a broadcast 1-row aggregate, not a driver collect.
    */
  def watermarkFilter(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    Incremental.recentTail(ev, "ts", "INTERVAL 7 DAY")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .orderBy("event_type")
  }

  /** Data-quality report (SURVEY §2.10 Q1-Q5 + F6/Q8) — one row per
    * check, all checks fully distributed.
    */
  def dqSummary(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    val lineitem = Tables.lineitem(spark, dir)
    val documents = Tables.documents(spark, dir)
    val events = Tables.events(spark, dir)
    Checks.summary(Seq(
      Checks.unique(orders, "o_orderkey", "orders_id_unique"),
      Checks.notNull(orders, "o_custkey", "orders_custkey_not_null"),
      Checks.relationships(lineitem, "l_orderkey", orders, "o_orderkey",
        "lineitem_orderkey_in_orders"),
      // warn severity, mirroring the reference's warn-level visibility
      // not_null (dbt/models/stg/schema.yml:56-58)
      Checks.acceptedValues(documents, "lang", Seq("de", "en", "es", "fr", "zh"),
        "documents_lang_accepted", severity = Checks.Warn),
      Checks.expression(events, col("value") < 0, "events_value_not_negative")))
  }

  val defs: Map[String, Q] = Map(
    "metar_stage_events" -> (stageEvents _),
    "metar_ods_guarded_cast" -> (odsGuardedCast _),
    "metar_latest_per_key" -> (latestPerKey _),
    "metar_daily_metrics" -> (dailyMetrics _),
    "metar_watermark_filter" -> (watermarkFilter _),
    "dq_summary" -> (dqSummary _))

  val oracles: Map[String, String] = Map(
    "metar_stage_events" ->
      """SELECT event_id, user_id, event_type, value,
        |  CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS event_date,
        |  CAST(props->>'k' AS INTEGER) AS k
        |FROM events ORDER BY event_id""".stripMargin,
    "metar_ods_guarded_cast" ->
      """SELECT event_id,
        |  CASE WHEN regexp_full_match(props->>'k', '[0-9]+')
        |       THEN CAST(props->>'k' AS INTEGER) END AS k_int,
        |  CASE WHEN regexp_full_match(event_type, '[0-9]+')
        |       THEN CAST(event_type AS INTEGER) END AS type_int,
        |  COALESCE(props->>'missing', props->>'k') AS k_fallback,
        |  event_type
        |FROM events
        |WHERE regexp_full_match(props->>'k', '[0-9]+')
        |ORDER BY event_id""".stripMargin,
    "metar_latest_per_key" ->
      """SELECT user_id, event_id, event_type, value FROM (
        |  SELECT user_id, event_id, event_type, value,
        |         row_number() OVER (PARTITION BY user_id
        |           ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
        |  FROM events) t
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "metar_daily_metrics" ->
      """SELECT user_id,
        |  CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
        |  round(avg(value), 4) AS avg_value,
        |  max(value) AS max_value,
        |  min(value) AS min_value,
        |  count(*) AS n_events,
        |  concat(CAST(user_id AS VARCHAR), '_', strftime(
        |    CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE), '%Y%m%d'))
        |    AS user_id_date
        |FROM events GROUP BY 1, 2 ORDER BY user_id, day""".stripMargin,
    "metar_watermark_filter" ->
      """SELECT event_type, count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events
        |WHERE CAST(ts AS TIMESTAMP) >=
        |  (SELECT max(CAST(ts AS TIMESTAMP)) - INTERVAL 7 DAY FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "dq_summary" ->
      """SELECT * FROM (
        |  SELECT 'orders_id_unique' AS check_name,
        |    CAST(count(o_orderkey) - count(DISTINCT o_orderkey) AS BIGINT) AS violations,
        |    'error' AS severity
        |  FROM orders
        |  UNION ALL
        |  SELECT 'orders_custkey_not_null',
        |    CAST(count(CASE WHEN o_custkey IS NULL THEN 1 END) AS BIGINT), 'error'
        |  FROM orders
        |  UNION ALL
        |  -- dbt relationships semantics: null child keys are not orphans
        |  SELECT 'lineitem_orderkey_in_orders', CAST(count(*) AS BIGINT), 'error'
        |  FROM lineitem WHERE l_orderkey IS NOT NULL AND NOT EXISTS
        |    (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
        |  UNION ALL
        |  SELECT 'documents_lang_accepted',
        |    CAST(count(CASE WHEN lang IS NOT NULL
        |      AND lang NOT IN ('de','en','es','fr','zh') THEN 1 END) AS BIGINT), 'warn'
        |  FROM documents
        |  UNION ALL
        |  SELECT 'events_value_not_negative',
        |    CAST(count(CASE WHEN value < 0 THEN 1 END) AS BIGINT), 'error'
        |  FROM events
        |) t ORDER BY check_name""".stripMargin)
}
