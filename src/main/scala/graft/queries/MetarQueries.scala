package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.metar.{MetarFixture, Normalize}
import graft.operators.{DailyRollup, LatestPerKey}

/** The reference pipeline end-to-end on its own document shape:
  * normalize (collector), latest-per-station (int layer), daily
  * airport mart (dwh layer) — run over the shared fixture documents so
  * the DuckDB oracle (inline VALUES of the identical JSON) checks the
  * whole METAR path, not just the events stand-in.
  */
object MetarQueries {

  type Q = (SparkSession, String) => DataFrame

  private def fixtureDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    MetarFixture.docs.toDF("payload")
  }

  private def normalized(spark: SparkSession): DataFrame =
    Normalize(fixtureDf(spark), insertedAt = lit("2025-12-12 08:00:00").cast("timestamp"))

  private val scalarCols = Seq(
    "icao", "observed", "raw_text", "flight_category", "temperature_c",
    "dewpoint_c", "wind_dir_deg", "wind_speed_kt", "wind_gust_kt",
    "visibility_m", "barometer_hpa", "humidity_percent", "station_name",
    "station_lon", "station_lat")

  /** Collector flattening (SURVEY P1-P5) over the fixture. */
  def metarNormalize(spark: SparkSession, dir: String): DataFrame =
    normalized(spark)
      .withColumn("n_clouds", coalesce(size(col("clouds")), lit(0)).cast("long"))
      .select((scalarCols.map(col) :+ col("n_clouds") :+ col("source")): _*)
      .orderBy("icao", "observed")

  /** int layer: latest observation per station (SURVEY A3/W1). The
    * order is a TOTAL order (LatestPerKey's documented requirement):
    * a corrected/re-issued METAR can share `observed` with the report
    * it supersedes, and a bare observed-DESC would let the engine's
    * max_by and the oracle's row_number pick DIFFERENT arbitrary rows
    * — the remaining columns break the tie identically on both sides.
    */
  def metarPipelineLatest(spark: SparkSession, dir: String): DataFrame =
    LatestPerKey(
      normalized(spark).select("icao", "observed", "temperature_c",
        "wind_speed_kt", "visibility_m", "flight_category"),
      keys = Seq("icao"), orderCols = Seq("observed", "temperature_c",
        "wind_speed_kt", "visibility_m", "flight_category"))
      .orderBy("icao")

  /** dwh layer: daily per-airport metrics with surrogate key
    * (SURVEY A1, P13-P15 — mirrors dw_daily_airport_metrics exactly).
    */
  def metarPipelineDaily(spark: SparkSession, dir: String): DataFrame =
    DailyRollup(
      normalized(spark).select("icao", "observed", "temperature_c",
        "wind_speed_kt", "visibility_m"),
      key = "icao", tsCol = "observed", metrics = Seq(
        round(avg(col("temperature_c")), 4).as("avg_temp_c"),
        max(col("wind_speed_kt")).as("max_wind_kt"),
        min(col("visibility_m")).as("min_visibility_m"),
        count(lit(1)).as("observations_count")))
      .orderBy("icao", "day")

  /** Nested array-of-struct surface (SURVEY §1.2: clouds pass through
    * unflattened): explode each observation's cloud layers to rows.
    */
  def metarClouds(spark: SparkSession, dir: String): DataFrame =
    normalized(spark)
      .select(col("icao"), col("observed"),
        posexplode_outer(col("clouds")).as(Seq("layer_idx", "cloud")))
      .select(col("icao"), col("observed"),
        col("layer_idx").cast("long").as("layer_idx"),
        col("cloud.code").as("cloud_code"),
        col("cloud.feet").as("cloud_feet"))
      .orderBy("icao", "observed", "layer_idx")

  val defs: Map[String, Q] = Map(
    "metar_normalize" -> (metarNormalize _),
    "metar_pipeline_latest" -> (metarPipelineLatest _),
    "metar_pipeline_daily" -> (metarPipelineDaily _),
    "metar_clouds" -> (metarClouds _))

  private def rawCte =
    s"raw(payload) AS (SELECT * FROM ${MetarFixture.valuesSql} v(payload))"

  private val extractSql =
    """json_extract_string(payload, '$.icao') AS icao,
      |  CAST(json_extract_string(payload, '$.observed') AS TIMESTAMP) AS observed,
      |  COALESCE(json_extract_string(payload, '$.raw_text'),
      |           json_extract_string(payload, '$.raw')) AS raw_text,
      |  json_extract_string(payload, '$.flight_category') AS flight_category,
      |  CAST(json_extract_string(payload, '$.temperature.celsius') AS DOUBLE) AS temperature_c,
      |  CAST(json_extract_string(payload, '$.dewpoint.celsius') AS DOUBLE) AS dewpoint_c,
      |  CAST(json_extract_string(payload, '$.wind.degrees') AS DOUBLE) AS wind_dir_deg,
      |  CAST(json_extract_string(payload, '$.wind.speed_kts') AS DOUBLE) AS wind_speed_kt,
      |  CAST(json_extract_string(payload, '$.wind.gust_kts') AS DOUBLE) AS wind_gust_kt,
      |  CAST(json_extract_string(payload, '$.visibility.meters') AS DOUBLE) AS visibility_m,
      |  CAST(json_extract_string(payload, '$.barometer.hpa') AS DOUBLE) AS barometer_hpa,
      |  CAST(json_extract_string(payload, '$.humidity.percent') AS DOUBLE) AS humidity_percent,
      |  json_extract_string(payload, '$.station.name') AS station_name,
      |  CASE WHEN json_array_length(payload, '$.station.geometry.coordinates') >= 2
      |    THEN CAST(json_extract(payload, '$.station.geometry.coordinates[0]') AS DOUBLE)
      |    END AS station_lon,
      |  CASE WHEN json_array_length(payload, '$.station.geometry.coordinates') >= 2
      |    THEN CAST(json_extract(payload, '$.station.geometry.coordinates[1]') AS DOUBLE)
      |    END AS station_lat""".stripMargin

  def oracles: Map[String, String] = Map(
    "metar_clouds" ->
      s"""WITH $rawCte,
        |obs AS (SELECT payload,
        |  json_extract_string(payload, '$$.icao') AS icao,
        |  CAST(json_extract_string(payload, '$$.observed') AS TIMESTAMP) AS observed,
        |  COALESCE(json_array_length(payload, '$$.clouds'), 0) AS n
        |  FROM raw),
        |idx AS (SELECT icao, observed, payload,
        |  unnest(CASE WHEN n = 0 THEN [CAST(NULL AS BIGINT)]
        |    ELSE generate_series(0, CAST(n - 1 AS BIGINT)) END) AS i
        |  FROM obs)
        |SELECT icao, observed, i AS layer_idx,
        |  json_extract_string(payload, '$$.clouds[' || i || '].code') AS cloud_code,
        |  CAST(json_extract_string(payload, '$$.clouds[' || i || '].feet') AS DOUBLE)
        |    AS cloud_feet
        |FROM idx ORDER BY icao, observed, layer_idx""".stripMargin,
    "metar_normalize" ->
      s"""WITH $rawCte
        |SELECT $extractSql,
        |  CAST(COALESCE(json_array_length(payload, '$$.clouds'), 0) AS BIGINT)
        |    AS n_clouds,
        |  'checkwx' AS source
        |FROM raw ORDER BY icao, observed""".stripMargin,
    "metar_pipeline_latest" ->
      s"""WITH $rawCte,
        |stg AS (SELECT $extractSql FROM raw)
        |SELECT icao, observed, temperature_c, wind_speed_kt, visibility_m,
        |  flight_category
        |FROM (SELECT icao, observed, temperature_c, wind_speed_kt, visibility_m,
        |    flight_category,
        |    -- full-tuple tie-break mirrors the Spark side's total order
        |    row_number() OVER (PARTITION BY icao ORDER BY observed DESC,
        |      temperature_c DESC, wind_speed_kt DESC, visibility_m DESC,
        |      flight_category DESC) AS rn
        |  FROM stg) t
        |WHERE rn = 1 ORDER BY icao""".stripMargin,
    "metar_pipeline_daily" ->
      s"""WITH $rawCte,
        |stg AS (SELECT $extractSql FROM raw)
        |SELECT icao, CAST(date_trunc('day', observed) AS DATE) AS day,
        |  round(avg(temperature_c), 4) AS avg_temp_c,
        |  max(wind_speed_kt) AS max_wind_kt,
        |  min(visibility_m) AS min_visibility_m,
        |  count(*) AS observations_count,
        |  concat(icao, '_', strftime(CAST(date_trunc('day', observed) AS DATE),
        |    '%Y%m%d')) AS icao_date
        |FROM stg GROUP BY 1, 2 ORDER BY icao, day""".stripMargin)
}
