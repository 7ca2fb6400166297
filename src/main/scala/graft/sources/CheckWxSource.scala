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
    val timeoutSeconds: Int = 15) extends Serializable {

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

  /** Production construction from the environment — the reference's
    * `os.getenv` surface (`CHECKWX_API_KEY` required,
    * `CHECKWX_BASE_URL` + timeout optional), centralized in
    * [[graft.Config]].
    */
  def fromEnv(cfg: graft.Config = graft.Config()): CheckWxSource = {
    val key = cfg.checkwxApiKey.getOrElse(throw new IllegalArgumentException(
      "CHECKWX_API_KEY is not set — the collector cannot authenticate"))
    new CheckWxSource(httpTransport(key, cfg.httpTimeoutSeconds),
      cfg.checkwxBaseUrl, cfg.httpTimeoutSeconds)
  }

  /** Canned transport for tests / offline runs. */
  def fixture(docs: Seq[String]): CheckWxSource =
    new CheckWxSource(_ => s"""{"data":[${docs.mkString(",")}]}""")

  /** Production transport: `java.net.http` GET with the reference's
    * `X-API-Key` header and 15 s timeout, failing on non-2xx like
    * `raise_for_status` (`/root/reference/src/collector/main.py:57-68`).
    * Spec-tested against an in-process HTTP server (header delivery,
    * error propagation, timeout) — the zero-egress environment never
    * exercises it against the real API, by design.
    */
  def httpTransport(apiKey: String, timeoutSeconds: Int = 15): String => String = {
    lazy val client = java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(timeoutSeconds))
      .build()
    url => {
      val req = java.net.http.HttpRequest
        .newBuilder(java.net.URI.create(url))
        .timeout(java.time.Duration.ofSeconds(timeoutSeconds))
        .header("X-API-Key", apiKey)
        .GET().build()
      val resp =
        client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() / 100 != 2)
        throw new java.io.IOException(s"HTTP ${resp.statusCode()} from $url")
      resp.body()
    }
  }

  /** Production source over [[httpTransport]]. */
  def http(apiKey: String, base: String, timeoutSeconds: Int = 15): CheckWxSource =
    new CheckWxSource(httpTransport(apiKey, timeoutSeconds), base, timeoutSeconds)
}
