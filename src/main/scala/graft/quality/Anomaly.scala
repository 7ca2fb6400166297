package graft.quality

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Column anomaly monitoring (SURVEY Q7, elementary
  * `column_anomalies` at `/root/reference/dbt/models/stg/schema.yml:17,
  * 46,52,59`) and schema-drift detection (Q6, `schema_changes` at
  * `stg/schema.yml:8-9`).
  *
  * Two monitoring modes, both fully distributed:
  *
  *  - within-run: per-slice column metrics (row count, null count,
  *    mean, stddev) in one aggregation pass, each slice z-scored
  *    against the distribution of all slices ([[columnStats]]);
  *  - across runs (elementary's actual semantics): each pipeline run
  *    [[recordRun]]s its metrics into an append-only parquet
  *    monitoring table, and [[historyAnomalies]] z-scores every run
  *    against its PRECEDING runs — drift shows up the run it happens.
  *    Schema snapshots persist the same way ([[recordSchema]] /
  *    [[schemaDrift]]).
  *
  * The monitoring table is metadata-sized (rows = runs x monitored
  * columns), so the trailing-window analytics are trivially cheap at
  * any data scale; the expensive part — the metrics scan — is one
  * map-side-combined aggregate over the run's data.
  */
object Anomaly {

  /** One run's metrics for `valueCol` as a single row. Doubles are
    * rounded so the persisted history is deterministic across partition
    * orderings and engines. The row carries BOTH its identity keys:
    * `metric_col` (one monitoring table legitimately holds runs ×
    * monitored columns — without the discriminator two columns' series
    * would interleave in one history window) and `recorded_at` (the
    * ingestion stamp that orders the history; the run_id STRING cannot
    * — lexicographic 'r9' > 'r10', the same hazard [[recordSchema]]
    * documents).
    */
  def runMetrics(df: DataFrame, valueCol: String, runId: String): DataFrame =
    df.agg(
        count(lit(1)).as("n_rows"),
        count(when(col(valueCol).isNull, 1)).as("n_nulls"),
        round(avg(col(valueCol)), 4).as("mean"),
        round(stddev_samp(col(valueCol)), 4).as("std"))
      .select(lit(runId).as("run_id"), lit(valueCol).as("metric_col"),
        col("n_rows"), col("n_nulls"), col("mean"), col("std"),
        lit(ingestStamp()).as("recorded_at"))

  /** Append one run's metrics to the monitoring table. */
  def recordRun(spark: SparkSession, monitorDir: String, df: DataFrame,
      valueCol: String, runId: String): Unit =
    graft.operators.MergeWriter.append(spark, monitorDir,
      runMetrics(df, valueCol, runId).coalesce(1))

  /** Q7 (elementary semantics): z-score each run's mean against the
    * runs BEFORE it. The first run has no history → null zscore, not
    * anomalous.
    */
  def historyAnomalies(spark: SparkSession, monitorDir: String): DataFrame = {
    // legacy histories (pre metric_col/recorded_at) read null-filled
    // via mergeSchema; a PURE-legacy dir lacks the columns entirely,
    // so synthesize them before they are referenced
    val raw = spark.read.option("mergeSchema", "true").parquet(monitorDir)
    val withMetric = if (raw.columns.contains("metric_col")) raw
      else raw.withColumn("metric_col", lit(null).cast("string"))
    val runs = if (withMetric.columns.contains("recorded_at")) withMetric
      else withMetric.withColumn("recorded_at", lit(null).cast("long"))
    // LEGACY rows (null metric_col) did not record which column they
    // monitored. When the stamped rows name exactly ONE metric — the
    // common single-column migration — adopt the legacy history into
    // that series so it keeps serving as the oldest baseline (the
    // null-stamp ordering below) instead of silently forming a
    // separate partition that no new run's window can see. With ≥2
    // stamped metrics the legacy rows' membership is genuinely
    // unknowable and they stay a conservative separate series.
    val stampedCols = runs.filter(col("metric_col").isNotNull)
      .select("metric_col").distinct().collect().map(_.getString(0))
    val series =
      if (stampedCols.length == 1)
        coalesce(col("metric_col"), lit(stampedCols.head))
      else coalesce(col("metric_col"), lit(""))
    // per-metric history windows over a runs × columns metadata table
    // (few partitions, each tiny): two monitored columns of the same
    // table must never z-score against each other's means. Ordered by
    // the ingestion stamp, NOT the run_id string (lexicographic
    // 'r9' > 'r10' would hand r10 the wrong preceding set); null
    // stamps (legacy rows) sort first = oldest, run_id breaks ties
    // deterministically.
    val hist = Window.partitionBy(series)
      .orderBy(col("recorded_at").asc_nulls_first, col("run_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    runs
      .withColumn("hist_mean", round(avg(col("mean")).over(hist), 6))
      .withColumn("hist_std", round(stddev_samp(col("mean")).over(hist), 6))
      .withColumn("zscore",
        when(col("hist_std") > 0,
          round((col("mean") - col("hist_mean")) / col("hist_std"), 4)))
      .withColumn("is_anomaly", coalesce(abs(col("zscore")) > 3.0, lit(false)))
      .orderBy("run_id")
  }

  /** Monotonic-per-process ingestion stamp: wall-clock millis scaled
    * to leave room for a sequence tiebreak, so snapshots recorded
    * within the same millisecond still order by call order. Across
    * processes it degrades to wall-clock ordering — the right
    * granularity for run-level drift monitoring.
    */
  private val recordSeq = new java.util.concurrent.atomic.AtomicLong()
  private def ingestStamp(): Long =
    System.currentTimeMillis() * 1000000L + (recordSeq.getAndIncrement() % 1000000L)

  /** Persist a run's schema snapshot as (run_id, column, type,
    * recorded_at) rows. `recorded_at` (not the run_id string) orders
    * the history — 'r9' vs 'r10' shows why lexicographic run ids
    * cannot: [[schemaDrift]] would prune and diff the wrong runs.
    */
  def recordSchema(spark: SparkSession, schemaDir: String, df: DataFrame,
      runId: String): Unit = {
    import spark.implicits._
    val at = ingestStamp()
    graft.operators.MergeWriter.append(spark, schemaDir,
      schemaSnapshot(df).map { case (c, t) => (runId, c, t, at) }
        .toDF("run_id", "column_name", "column_type", "recorded_at")
        .coalesce(1))
  }

  /** Q6 across runs: diff every consecutive snapshot pair in the
    * trailing `lastRuns` window of the persisted history. Each row is
    * (run, column)-sized metadata, but the table grows without bound —
    * a daily pipeline collects a decade of runs otherwise — so the
    * collect is pruned in-frame to the last `lastRuns`+1 snapshots
    * (enough for `lastRuns` consecutive diffs; drift is reported the
    * run it happens, so older pairs were already reported when they
    * were the newest).
    */
  def schemaDrift(spark: SparkSession, schemaDir: String,
      lastRuns: Int = 50): Seq[(String, Seq[String])] = {
    // mergeSchema: history dirs are plain appends, so a pre-existing
    // dir can mix legacy 3-column snapshot files with stamped 4-column
    // ones — without schema merge, whichever file footer wins picks
    // the schema and a legacy winner would drop `recorded_at` and
    // break the max() below nondeterministically (K5's widened appends
    // are null-filled at read time via mergeSchema, same as
    // MergeWriter documents)
    val snaps0 = spark.read.option("mergeSchema", "true").parquet(schemaDir)
    // a PURE-legacy history has no stamped file at all — mergeSchema
    // cannot invent the column, so synthesize it (all-null = all
    // oldest, run_id tiebreak orders them) instead of failing the
    // drift report with an unresolved column
    val snaps = if (snaps0.columns.contains("recorded_at")) snaps0
      else snaps0.withColumn("recorded_at", lit(null).cast("long"))
    // prune AND order on the ingestion stamp, never the run_id string
    // (lexicographic 'r9' > 'r10' would keep/diff the wrong runs);
    // pre-stamp history (null recorded_at) sorts oldest, which is
    // where un-stamped legacy snapshots belong; run_id as secondary
    // key makes the lastRuns+1 cut deterministic on stamp ties
    val keep = snaps.groupBy("run_id")
      .agg(max(col("recorded_at")).as("_at"))
      .orderBy(col("_at").desc_nulls_last, col("run_id")).limit(lastRuns + 1)
    val byRun = snaps.join(broadcast(keep), "run_id")
      .select("run_id", "column_name", "column_type", "_at").collect()
      .map(r => (r.getString(0), (r.getString(1), r.getString(2)),
        if (r.isNullAt(3)) Long.MinValue else r.getLong(3)))
      .groupBy(_._1)
    val cols = byRun.view.mapValues(_.map(_._2).sortBy(_._1).toSeq).toMap
    val runs = byRun.toSeq
      .map { case (run, rows) => (run, rows.map(_._3).max) }
      .sortBy { case (run, at) => (at, run) }.map(_._1)
    runs.zip(runs.drop(1)).map { case (prev, cur) =>
      cur -> schemaDiff(cols(prev), cols(cur))
    }
  }

  /** Per-slice stats + global z-score for the mean. */
  def columnStats(df: DataFrame, valueCol: String, sliceCol: String): DataFrame = {
    val slices = df.groupBy(col(sliceCol))
      .agg(
        count(lit(1)).as("n_rows"),
        count(when(col(valueCol).isNull, 1)).as("n_nulls"),
        avg(col(valueCol)).as("mean"),
        stddev_samp(col(valueCol)).as("std"))
    val all = Window.partitionBy()
    slices
      .withColumn("_mu", avg(col("mean")).over(all))
      .withColumn("_sigma", stddev_samp(col("mean")).over(all))
      .withColumn("zscore",
        when(col("_sigma") > 0, (col("mean") - col("_mu")) / col("_sigma")))
      .withColumn("is_anomaly",
        coalesce(abs(col("zscore")) > 3.0, lit(false)))
      .drop("_mu", "_sigma")
  }

  /** Schema snapshot as (column, type) rows — diffable across runs. */
  def schemaSnapshot(df: DataFrame): Seq[(String, String)] =
    df.schema.fields.map(f => (f.name, f.dataType.simpleString)).toSeq

  /** Q6: columns added/removed/retyped between two snapshots. */
  def schemaDiff(before: Seq[(String, String)], after: Seq[(String, String)])
      : Seq[String] = {
    val b = before.toMap
    val a = after.toMap
    val added = a.keySet.diff(b.keySet).toSeq.sorted.map(c => s"added:$c")
    val removed = b.keySet.diff(a.keySet).toSeq.sorted.map(c => s"removed:$c")
    val retyped = a.keySet.intersect(b.keySet).toSeq.sorted
      .filter(c => a(c) != b(c)).map(c => s"retyped:$c:${b(c)}->${a(c)}")
    added ++ removed ++ retyped
  }
}
