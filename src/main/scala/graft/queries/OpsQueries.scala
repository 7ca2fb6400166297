package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.Multimodal
import graft.pipeline.Medallion
import graft.quality.Anomaly

/** Operational surface: the full medallion DAG run end-to-end, column
  * anomaly monitoring (Q7), JSON serialization round-trip (P16) and
  * the multimodal binary-column pipeline.
  */
object OpsQueries {

  type Q = (SparkSession, String) => DataFrame

  /** O1/O2: bronze→stg→{int,dwh} layer DAG with merge materializations
    * and post-build quality gate; output = the dwh daily mart, checked
    * against the one-shot batch oracle (layered incremental execution
    * must converge to the direct answer).
    */
  def pipelineMedallion(spark: SparkSession, dir: String): DataFrame = {
    val root = Files.createTempDirectory("graft-medallion").toString
    Medallion.run(spark, dir, root)
      .select("user_id", "day", "avg_value", "max_value", "min_value",
        "n_events", "user_id_date")
      .orderBy("user_id", "day")
  }

  /** Q7: per-day column stats + z-score anomaly flags on event values. */
  def dqColumnAnomalies(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .withColumn("slice", to_date(date_trunc("day", col("ts"))))
    Anomaly.columnStats(ev, "value", "slice")
      .select(col("slice"), col("n_rows"), col("n_nulls"),
        round(col("mean"), 4).as("mean"), round(col("std"), 4).as("std"),
        round(col("zscore"), 2).as("zscore"), col("is_anomaly"))
      .orderBy("slice")
  }

  /** Q7 elementary semantics: four pipeline "runs" (date slices of the
    * events feed) each persist their column metrics into an append-only
    * parquet monitoring table; each run is then z-scored against the
    * runs before it — metric drift is caught the run it happens, with
    * the history surviving process restarts (unlike a within-run
    * z-score, which can only compare slices it can see).
    */
  def dqHistoryAnomalies(spark: SparkSession, dir: String): DataFrame = {
    val monitor =
      Files.createTempDirectory("graft-monitor").resolve("metrics").toString
    val ev = Tables.events(spark, dir)
      .withColumn("event_date", to_date(col("ts")))
    val cuts = Seq("2024-01-08", "2024-01-15", "2024-01-22")
    val runs = Seq(
      "r1" -> ev.filter(col("event_date") < cuts(0)),
      "r2" -> ev.filter(col("event_date") >= cuts(0) && col("event_date") < cuts(1)),
      "r3" -> ev.filter(col("event_date") >= cuts(1) && col("event_date") < cuts(2)),
      "r4" -> ev.filter(col("event_date") >= cuts(2)))
    runs.foreach { case (id, d) =>
      Anomaly.recordRun(spark, monitor, d, "value", id)
    }
    Anomaly.historyAnomalies(spark, monitor)
      .select("run_id", "n_rows", "n_nulls", "mean", "std",
        "hist_mean", "hist_std", "zscore", "is_anomaly")
  }

  /** P16: document → JSON string → field re-extraction round-trip. */
  def jsonRoundtrip(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_id"),
        to_json(struct(col("event_id"), col("event_type"), col("value")))
          .as("payload"))
      .withColumn("event_type_rt", get_json_object(col("payload"), "$.event_type"))
      .withColumn("value_rt", get_json_object(col("payload"), "$.value").cast("double"))
      .orderBy("event_id")

  /** Multimodal: binary media table → batched per-partition feature
    * extraction (stubbed codec; plumbing real).
    */
  def multimodalFeatures(spark: SparkSession, dir: String): DataFrame =
    Multimodal.documentFeatures(spark, Tables.documents(spark, dir))
      .select(col("id"), col("modality"), col("n_bytes"), col("first_byte"),
        col("last_byte"), col("checksum"), size(col("features")).as("n_features"))
      .orderBy("id")

  /** Multimodal frame sampling: each document's blob treated as a
    * frame sequence; ≤8 evenly spaced 64-codepoint frames per asset,
    * one row per frame with a content signature.
    */
  def multimodalFrames(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Multimodal.sampleFrames(
        Multimodal.mediaFromDocuments(Tables.documents(spark, dir))
          .as[Multimodal.MediaRow])
      .toDF()
      .orderBy("id", "frame_idx")
  }

  val defs: Map[String, Q] = Map(
    "pipeline_medallion" -> (pipelineMedallion _),
    "dq_column_anomalies" -> (dqColumnAnomalies _),
    "dq_history_anomalies" -> (dqHistoryAnomalies _),
    "json_roundtrip" -> (jsonRoundtrip _),
    "multimodal_features" -> (multimodalFeatures _),
    "multimodal_frames" -> (multimodalFrames _))

  val oracles: Map[String, String] = Map(
    // layered incremental run must equal the one-shot daily-mart SQL
    "pipeline_medallion" -> PipelineQueries.oracles("streaming_daily_metrics"),
    "dq_column_anomalies" ->
      """WITH s AS (
        |  SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS slice,
        |    count(*) AS n_rows,
        |    CAST(count(CASE WHEN value IS NULL THEN 1 END) AS BIGINT) AS n_nulls,
        |    avg(value) AS mean, stddev_samp(value) AS std
        |  FROM events GROUP BY 1),
        |z AS (SELECT *, avg(mean) OVER () AS mu,
        |        stddev_samp(mean) OVER () AS sigma FROM s)
        |SELECT slice, n_rows, n_nulls, round(mean, 4) AS mean,
        |  round(std, 4) AS std,
        |  round(CASE WHEN sigma > 0 THEN (mean - mu) / sigma END, 2) AS zscore,
        |  COALESCE(CASE WHEN sigma > 0
        |    THEN abs((mean - mu) / sigma) END > 3.0, FALSE) AS is_anomaly
        |FROM z ORDER BY slice""".stripMargin,
    "dq_history_anomalies" ->
      """WITH ev AS (SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE)
        |    AS d, value FROM events),
        |m AS (
        |  SELECT CASE WHEN d < DATE '2024-01-08' THEN 'r1'
        |              WHEN d < DATE '2024-01-15' THEN 'r2'
        |              WHEN d < DATE '2024-01-22' THEN 'r3'
        |              ELSE 'r4' END AS run_id,
        |    count(*) AS n_rows,
        |    CAST(count(CASE WHEN value IS NULL THEN 1 END) AS BIGINT) AS n_nulls,
        |    round(avg(value), 4) AS mean, round(stddev_samp(value), 4) AS std
        |  FROM ev GROUP BY 1),
        |h AS (SELECT *,
        |    round(avg(mean) OVER w, 6) AS hist_mean,
        |    round(stddev_samp(mean) OVER w, 6) AS hist_std
        |  FROM m WINDOW w AS (ORDER BY run_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        |SELECT run_id, n_rows, n_nulls, mean, std, hist_mean, hist_std,
        |  CASE WHEN hist_std > 0
        |    THEN round((mean - hist_mean) / hist_std, 4) END AS zscore,
        |  COALESCE(CASE WHEN hist_std > 0
        |    THEN abs(round((mean - hist_mean) / hist_std, 4)) END > 3.0, FALSE)
        |    AS is_anomaly
        |FROM h ORDER BY run_id""".stripMargin,
    "json_roundtrip" ->
      """SELECT event_id,
        |  to_json(struct_pack(event_id := event_id, event_type := event_type,
        |    value := value))::VARCHAR AS payload,
        |  event_type AS event_type_rt,
        |  value AS value_rt
        |FROM events ORDER BY event_id""".stripMargin,
    "multimodal_features" ->
      """SELECT doc_id AS id, 'text' AS modality,
        |  CAST(length(text) AS BIGINT) AS n_bytes,
        |  ascii(substr(text, 1, 1)) AS first_byte,
        |  ascii(substr(text, length(text), 1)) AS last_byte,
        |  CAST(list_sum(list_transform(generate_series(1, length(text)),
        |    i -> ascii(substr(text, i, 1)))) % 256 AS INTEGER) AS checksum,
        |  3 AS n_features
        |FROM documents ORDER BY id""".stripMargin,
    "multimodal_frames" ->
      """WITH d AS (SELECT doc_id AS id, text,
        |    (length(text) + 63) // 64 AS fc
        |  FROM documents WHERE length(text) > 0),
        |s AS (SELECT id, text, fc, least(8, fc) AS k FROM d),
        |f AS (SELECT id, text, fc, (j * fc) // k AS frame_idx
        |  FROM s CROSS JOIN generate_series(0, 7) AS g(j) WHERE j < k),
        |x AS (SELECT id, fc, frame_idx,
        |  substring(text, CAST(frame_idx * 64 + 1 AS BIGINT), 64) AS ft
        |  FROM f)
        |SELECT id, 'text' AS modality, CAST(fc AS BIGINT) AS n_frames,
        |  CAST(frame_idx AS BIGINT) AS frame_idx,
        |  CAST(length(ft) AS BIGINT) AS frame_chars, md5(ft) AS frame_sig
        |FROM x ORDER BY id, frame_idx""".stripMargin)
}
