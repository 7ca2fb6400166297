package graft.metar

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Flattening of decoded METAR JSON documents into the ~30-column
  * observation record — the reference collector's `normalize_metar`
  * (`/root/reference/src/collector/main.py:86-172`) as a single
  * `from_json` + projection:
  *
  *  - P1 nested-path extraction with null default → struct field refs
  *    (null-safe on missing sub-objects);
  *  - P2 struct flattening (10 sub-objects → prefixed scalars);
  *  - P3 positional coordinate access with length guard
  *    (`main.py:104-109`);
  *  - P4 `raw_text or raw` fallback (`main.py:115`);
  *  - P5 literal `source` + ingest timestamp (`main.py:90,168-169`).
  *
  * One JSON parse per document (the reference's JSONB staging re-parses
  * per field, SURVEY P6 note); all downstream expressions are struct
  * field accesses inside codegen.
  */
object Normalize {

  /** @param insertedAt ingest-time column; defaults to
    *                   `current_timestamp()` like the reference, made
    *                   injectable for deterministic tests.
    */
  def apply(raw: DataFrame, payloadCol: String = "payload",
      insertedAt: Column = current_timestamp()): DataFrame = {
    val p = from_json(col(payloadCol), MetarSchema.schema)
    val coords = p.getField("station").getField("geometry").getField("coordinates")
    val guard2 = size(coords) >= 2

    raw.select(
      p.getField("icao").as("icao"),
      to_timestamp(p.getField("observed")).as("observed"),
      coalesce(p.getField("raw_text"), p.getField("raw")).as("raw_text"),
      p.getField("flight_category").as("flight_category"),
      p.getField("temperature").getField("celsius").as("temperature_c"),
      p.getField("temperature").getField("fahrenheit").as("temperature_f"),
      p.getField("dewpoint").getField("celsius").as("dewpoint_c"),
      p.getField("dewpoint").getField("fahrenheit").as("dewpoint_f"),
      p.getField("wind").getField("degrees").as("wind_dir_deg"),
      p.getField("wind").getField("speed_kts").as("wind_speed_kt"),
      p.getField("wind").getField("speed_mps").as("wind_speed_mps"),
      p.getField("wind").getField("speed_kph").as("wind_speed_kph"),
      p.getField("wind").getField("speed_mph").as("wind_speed_mph"),
      p.getField("wind").getField("gust_kts").as("wind_gust_kt"),
      p.getField("visibility").getField("meters").as("visibility_m"),
      p.getField("visibility").getField("meters_text").as("visibility_m_text"),
      p.getField("visibility").getField("miles").as("visibility_miles"),
      p.getField("visibility").getField("miles_text").as("visibility_miles_text"),
      p.getField("barometer").getField("hg").as("barometer_hg"),
      p.getField("barometer").getField("hpa").as("barometer_hpa"),
      p.getField("barometer").getField("kpa").as("barometer_kpa"),
      p.getField("barometer").getField("mb").as("barometer_mb"),
      p.getField("ceiling").getField("feet").as("ceiling_feet"),
      p.getField("ceiling").getField("meters").as("ceiling_meters"),
      p.getField("humidity").getField("percent").as("humidity_percent"),
      p.getField("elevation").getField("feet").as("elevation_feet"),
      p.getField("elevation").getField("meters").as("elevation_meters"),
      p.getField("station").getField("name").as("station_name"),
      p.getField("station").getField("location").as("station_location"),
      p.getField("station").getField("type").as("station_type"),
      when(guard2, element_at(coords, 1)).as("station_lon"),
      when(guard2, element_at(coords, 2)).as("station_lat"),
      p.getField("clouds").as("clouds"),
      p.getField("conditions").as("conditions"),
      lit("checkwx").as("source"),
      insertedAt.as("inserted_at"))
  }
}
