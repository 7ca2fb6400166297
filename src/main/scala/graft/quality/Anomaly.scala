package graft.quality

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Column anomaly monitoring (SURVEY Q7, elementary
  * `column_anomalies` at `/root/reference/dbt/models/stg/schema.yml:17,
  * 46,52,59`) and schema-drift detection (Q6, `schema_changes` at
  * `stg/schema.yml:8-9`).
  *
  * Per-slice column metrics (row count, null count, mean, stddev) are
  * one aggregation pass; each slice's z-score against the distribution
  * of all slices flags outliers. Everything stays distributed — the
  * "history" is just another aggregate, joined back by window
  * functions over the slice rows (|slices| rows, trivially small).
  */
object Anomaly {

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
