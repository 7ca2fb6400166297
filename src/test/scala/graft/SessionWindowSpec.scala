package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Sessionize

/** Native `session_window` vs the custom islands operator: identical
  * sessions, including at the boundary — Spark merges a gap of
  * exactly the timeout (strictly-greater break), same as the custom
  * operator; only a gap strictly over the timeout splits.
  */
class SessionWindowSpec extends SparkSpec {

  private def ts(min: Long): Timestamp = new Timestamp(min * 60000L)

  test("native session_window matches islands sessions on real data") {
    val native = graft.queries.AnalyticsQueries.sessionizeNative(spark, sf)
    val custom = Sessionize(Tables.events(spark, sf), key = "user_id",
        tsCol = "ts", gapSeconds = 1800, tieBreak = Seq("event_id"))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n_events"), min(col("event_id")).as("first_event_id"))
    // real timestamps essentially never land on the exact 1800s
    // boundary, so the session COUNT and event partition must agree
    assert(native.count() === custom.count())
    assert(
      native.agg(sum("n_events")).head().getLong(0) ===
        custom.agg(sum("n_events")).head().getLong(0))
  }

  test("boundary: gap == timeout merges in BOTH; gap just over splits") {
    import spark.implicits._
    val ev = Seq(
      (1L, ts(0), 10L, "e", 1.0, "{}"),
      (2L, ts(30), 10L, "e", 1.0, "{}"),   // gap == 30 min exactly
      (3L, ts(61), 10L, "e", 1.0, "{}"))   // gap 31 min > timeout
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val native = ev.groupBy(col("user_id"),
        session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n")).collect()
    assert(native.length === 2,
      "exact-boundary gap merges, strictly-over gap splits")
    val custom = Sessionize(ev, "user_id", "ts", 1800, Seq("event_id"))
      .select(col("session_seq")).distinct().count()
    assert(custom === 2, "custom operator agrees at both boundaries")
  }
}
