package graft.pipeline

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

/** Run observability: captures `Dataset.observe(...)` metrics (A4 —
  * affected-row counts without a second scan) through a
  * `QueryExecutionListener` and persists them as rows of the same
  * monitoring table the anomaly history uses — so operational metrics
  * and data-quality history land in one queryable place.
  *
  * `observe` metrics are accumulated ON the executors as the action
  * runs (zero extra jobs, zero extra scans — the aggregates piggyback
  * on the pass the query already makes); the listener only reads the
  * tiny result map on the driver. At 100 TB this is the only
  * affordable way to count what a pipeline did.
  */
object Metrics {

  /** Collects (observation name, metric column → value) per completed
    * action. Bounded: keeps at most `cap` entries (drop-oldest), so a
    * long-lived session can't leak.
    */
  final class Collector(cap: Int = 1024) extends QueryExecutionListener {
    private val buf = mutable.ArrayDeque.empty[(String, Map[String, Any])]

    override def onSuccess(funcName: String, qe: QueryExecution,
        durationNs: Long): Unit = synchronized {
      qe.observedMetrics.foreach { case (name, row) =>
        val m = row.schema.fieldNames.zip(row.toSeq).toMap
        buf.append((name, m))
        if (buf.size > cap) buf.removeHead()
      }
    }

    override def onFailure(funcName: String, qe: QueryExecution,
        exception: Exception): Unit = ()

    def snapshot: Seq[(String, Map[String, Any])] = synchronized(buf.toSeq)

    def clear(): Unit = synchronized(buf.clear())
  }

  /** Register a collector on the session (remove with
    * `spark.listenerManager.unregister`).
    */
  def attach(spark: SparkSession): Collector = {
    val c = new Collector()
    spark.listenerManager.register(c)
    c
  }

  /** Persist captured metrics to the monitoring dir as long-typed
    * (run_id, observation, metric, value) rows — the operational twin
    * of [[graft.quality.Anomaly.recordRun]].
    */
  def record(spark: SparkSession, monitorDir: String, runId: String,
      captured: Seq[(String, Map[String, Any])]): Unit = {
    import spark.implicits._
    val rows = captured.flatMap { case (obs, m) =>
      m.toSeq.map { case (k, v) =>
        (runId, obs, k, String.valueOf(v))
      }
    }
    if (rows.nonEmpty)
      graft.operators.MergeWriter.append(spark, monitorDir,
        rows.toDF("run_id", "observation", "metric", "value").coalesce(1))
  }

  /** Read back the monitoring table. */
  def history(spark: SparkSession, monitorDir: String): DataFrame =
    spark.read.parquet(monitorDir)
      .orderBy(col("run_id"), col("observation"), col("metric"))
}
