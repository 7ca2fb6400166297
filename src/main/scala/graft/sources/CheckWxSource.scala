package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** REST API source (SURVEY S1): the reference fetches decoded METARs
  * for a batched ICAO list with an API-key header and 15 s timeout
  * (`/root/reference/src/collector/main.py:53-69`), unwraps
  * `payload["data"]` and lands one document per observation.
  *
  * The HTTP transport is injectable: production supplies a real
  * `java.net.http` call (driver-side — 20 rows per 30 min does not
  * justify a DataSourceV2); tests and this zero-egress environment
  * supply a canned-body transport. Unwrapping the `data` array happens
  * distributed, with Spark JSON functions, so a large response body
  * (backfills) never needs driver-side parsing.
  */
class CheckWxSource(transport: String => String,
    base: String = "https://api.example.invalid/metar",
    timeoutSeconds: Int = 15) extends Serializable {

  def url(icaos: Seq[String]): String =
    s"$base/${icaos.mkString(",")}/decoded"

  /** One row per element of the response's `data` array, as a raw JSON
    * `payload` string — the bronze-zone record (feed to
    * graft.metar.Normalize).
    */
  def fetchDecoded(spark: SparkSession, icaos: Seq[String]): DataFrame = {
    import spark.implicits._
    val body = transport(url(icaos))
    Seq(body).toDF("_body")
      .withColumn("_n",
        coalesce(json_array_length(get_json_object(col("_body"), "$.data")), lit(0)))
      .filter(col("_n") > 0) // empty-input guard (SURVEY F5)
      .select(col("_body"), explode(sequence(lit(0L), col("_n").cast(LongType) - 1)).as("_i"))
      .select(expr("get_json_object(_body, concat('$.data[', _i, ']'))")
        .as("payload"))
  }
}

object CheckWxSource {

  /** Canned transport for tests / offline runs. */
  def fixture(docs: Seq[String]): CheckWxSource =
    new CheckWxSource(_ => s"""{"data":[${docs.mkString(",")}]}""")
}
