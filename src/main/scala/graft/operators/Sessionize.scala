package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: assigns a per-key session sequence number
  * that increments whenever the time since the previous event exceeds
  * `gapSeconds`. Generalizes the reference's event-time semantics (its
  * only "session" notion is the 30-min micro-batch cadence, SURVEY
  * §2.9 T1) into the session-window operator a training-data pipeline
  * needs; in streaming mode the same semantics come from
  * `session_window` (see graft.streaming).
  *
  * One shuffle on `key`, one sort per partition — the unavoidable
  * minimum for ordered per-key analysis. `tieBreak` must make the sort
  * total for deterministic output.
  */
object Sessionize {

  def apply(df: DataFrame, key: String, tsCol: String, gapSeconds: Long,
      tieBreak: Seq[String]): DataFrame = {
    val order = (col(tsCol) +: tieBreak.map(col)).map(_.asc)
    val w = Window.partitionBy(col(key)).orderBy(order: _*)
    val prevTs = lag(col(tsCol), 1).over(w)
    val isNew = when(
      prevTs.isNull ||
        (unix_micros(col(tsCol)) - unix_micros(prevTs)) > gapSeconds * 1000000L,
      1L).otherwise(0L)
    df.withColumn("session_seq",
      sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }
}
