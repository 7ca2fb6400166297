package graft

import org.apache.spark.sql.functions._

import graft.metar.{MetarFixture, Normalize}

/** Golden behaviors of the collector flattening (SURVEY P1-P5),
  * covering every tolerance path the reference implements:
  * `raw_text or raw` fallback, missing sub-objects → nulls, coordinate
  * length guard, literal source column.
  */
class MetarNormalizeSpec extends SparkSpec {

  private lazy val out = {
    import spark.implicits._
    Normalize(MetarFixture.docs.toDF("payload")).cache()
  }

  test("flattens all fixture docs") {
    assert(out.count() === 5)
    assert(out.columns.length === 36)
  }

  test("raw fallback when raw_text missing (P4)") {
    val uudd = out.filter(col("icao") === "UUDD").head()
    assert(uudd.getAs[String]("raw_text").startsWith("UUDD 120635Z"))
  }

  test("missing sub-objects yield nulls, not errors (P1)") {
    val ulli = out.filter(col("icao") === "ULLI").head()
    assert(ulli.isNullAt(ulli.fieldIndex("temperature_c")))
    assert(ulli.isNullAt(ulli.fieldIndex("station_name")))
    assert(ulli.isNullAt(ulli.fieldIndex("wind_speed_kt")))
  }

  test("short coordinates guarded to null (P3)") {
    val uuww = out.filter(col("icao") === "UUWW").head()
    assert(uuww.isNullAt(uuww.fieldIndex("station_lon")))
    assert(uuww.isNullAt(uuww.fieldIndex("station_lat")))
    val uuee = out.filter(col("icao") === "UUEE" &&
      col("observed") === lit("2025-12-12 06:30:00").cast("timestamp")).head()
    assert(math.abs(uuee.getAs[Double]("station_lon") - 37.414589) < 1e-9)
  }

  test("observed parses ISO-8601 Z to UTC timestamp (P7)") {
    val ts = out.filter(col("icao") === "ULLI")
      .select(date_format(col("observed"), "yyyy-MM-dd HH:mm:ss")).head().getString(0)
    assert(ts === "2025-12-12 06:30:00")
  }

  test("literal source column (P5)") {
    assert(out.select("source").distinct().head().getString(0) === "checkwx")
  }

  test("array of cloud structs passes through unflattened") {
    val uuww = out.filter(col("icao") === "UUWW")
      .select(size(col("clouds"))).head().getInt(0)
    assert(uuww === 2)
  }
}
