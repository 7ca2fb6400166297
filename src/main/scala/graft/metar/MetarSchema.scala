package graft.metar

import org.apache.spark.sql.types._

/** Schema of a decoded CheckWX METAR document — the input shape
  * consumed by the reference collector's `normalize_metar`
  * (`/root/reference/src/collector/main.py:86-172`); field inventory
  * per `/root/repo/FIXTURES.md` §A1. Every field nullable: the
  * reference tolerates any missing sub-object (`main.py:92-100`).
  */
object MetarSchema {

  private def d = DoubleType
  private def s = StringType

  val cloud: StructType = StructType(Seq(
    StructField("code", s), StructField("text", s),
    StructField("feet", d), StructField("meters", d)))

  val schema: StructType = StructType(Seq(
    StructField("icao", s),
    StructField("observed", s), // ISO-8601 with offset; cast downstream (SURVEY P7)
    StructField("raw_text", s),
    StructField("raw", s), // drift fallback (`main.py:115`)
    StructField("flight_category", s),
    StructField("temperature", StructType(Seq(
      StructField("celsius", d), StructField("fahrenheit", d)))),
    StructField("dewpoint", StructType(Seq(
      StructField("celsius", d), StructField("fahrenheit", d)))),
    StructField("wind", StructType(Seq(
      StructField("degrees", d), StructField("speed_kts", d),
      StructField("speed_mps", d), StructField("speed_kph", d),
      StructField("speed_mph", d), StructField("gust_kts", d)))),
    StructField("visibility", StructType(Seq(
      StructField("meters", d), StructField("meters_text", s),
      StructField("miles", d), StructField("miles_text", s)))),
    StructField("barometer", StructType(Seq(
      StructField("hg", d), StructField("hpa", d),
      StructField("kpa", d), StructField("mb", d)))),
    StructField("ceiling", StructType(Seq(
      StructField("feet", d), StructField("meters", d)))),
    StructField("humidity", StructType(Seq(StructField("percent", d)))),
    StructField("elevation", StructType(Seq(
      StructField("feet", d), StructField("meters", d)))),
    StructField("station", StructType(Seq(
      StructField("name", s), StructField("location", s),
      StructField("type", s),
      StructField("geometry", StructType(Seq(
        StructField("type", s),
        StructField("coordinates", ArrayType(d)))))))),
    StructField("clouds", ArrayType(cloud)),
    StructField("conditions", ArrayType(StructType(Seq(
      StructField("code", s), StructField("text", s)))))))
}
