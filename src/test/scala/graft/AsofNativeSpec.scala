package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.AsofJoin

/** The native as-of join operator (custom LogicalPlan + Strategy +
  * SparkPlan) against the composed union+window form: identical
  * results on real data and on the semantic edge cases (no match,
  * equal-ts tie, matched-row-with-NULL-value, null keys), plus the
  * plan-shape guarantees the operator exists for.
  */
class AsofNativeSpec extends SparkSpec {

  private def composed(l: org.apache.spark.sql.DataFrame,
      r: org.apache.spark.sql.DataFrame) =
    AsofJoin.lastValue(l, r, keys = Seq("k"), leftTs = "ts", rightTs = "ts",
      rightValue = "v", tieBreak = "tb", asofCol = "asof")

  private def native(l: org.apache.spark.sql.DataFrame,
      r: org.apache.spark.sql.DataFrame) =
    AsofJoin.native(l, r, keys = Seq("k"), leftTs = "ts", rightTs = "ts",
      rightValue = "v", rightTieBreak = Seq("tb"), asofCol = "asof")

  test("type mismatch on key or ts fails loudly (no analyzer coercion on a native node)") {
    import spark.implicits._
    val l = Seq((1, 10L)).toDF("k", "ts")           // k: INT
    val rLongKey = Seq((1L, 5L, 7L, 0L)).toDF("k", "ts", "v", "tb") // k: BIGINT
    val e1 = intercept[IllegalArgumentException] {
      AsofJoin.native(l, rLongKey, keys = Seq("k"), leftTs = "ts",
        rightTs = "ts", rightValue = "v", rightTieBreak = Seq("tb"),
        asofCol = "asof")
    }
    assert(e1.getMessage.contains("key type mismatch"))
    val lL = Seq((1L, 10)).toDF("k", "ts")          // ts: INT
    val rTs = Seq((1L, 5L, 7L, 0L)).toDF("k", "ts", "v", "tb") // ts: BIGINT
    val e2 = intercept[IllegalArgumentException] {
      AsofJoin.native(lL, rTs, keys = Seq("k"), leftTs = "ts",
        rightTs = "ts", rightValue = "v", rightTieBreak = Seq("tb"),
        asofCol = "asof")
    }
    assert(e2.getMessage.contains("timestamp type mismatch"))
  }

  test("native == composed on the events table (purchases vs signups)") {
    val a = queries.AnalyticsQueries.asofSignup(spark, sf).collect()
    val b = queries.AnalyticsQueries.asofNative(spark, sf).collect()
    assert(a.toSeq == b.toSeq)
    assert(a.nonEmpty)
  }

  test("edge cases: no match, tie at equal ts, NULL value on matched row, null key") {
    import spark.implicits._
    // left: (k, ts, tb)
    val l = Seq(
      ("a", 10L, 1L),   // matches right (a,10) — tie: right visible
      ("a", 5L, 2L),    // before any right row for a -> null
      ("b", 99L, 3L),   // latest right row for b has NULL value -> NULL
      (null.asInstanceOf[String], 7L, 4L) // null key groups with null right key
    ).toDF("k", "ts", "tb")
    // right: (k, ts, tb, v); two rows at a@10 — larger tb wins
    val r = Seq(
      ("a", 10L, 10L, java.lang.Long.valueOf(100L)),
      ("a", 10L, 11L, java.lang.Long.valueOf(101L)),
      ("b", 50L, 12L, java.lang.Long.valueOf(200L)),
      ("b", 60L, 13L, null.asInstanceOf[java.lang.Long]),
      (null.asInstanceOf[String], 6L, 14L, java.lang.Long.valueOf(300L))
    ).toDF("k", "ts", "tb", "v")

    val got = native(l, r).orderBy("tb").select("k", "tb", "asof").collect().toSeq
    assert(got == Seq(
      Row("a", 1L, 101L),
      Row("a", 2L, null),
      Row("b", 3L, null),   // matched row b@60 exists but its value IS null
      Row(null, 4L, 300L)))
    // and the composed operator agrees on every one of these edges
    val comp = composed(l, r).orderBy("tb").select("k", "tb", "asof").collect().toSeq
    assert(comp == got)
  }

  test("plan: AsofJoinExec node, co-partitioned sides, no window/union machinery") {
    val ev = Tables.events(spark, sf)
    val l = ev.filter(col("event_type") === "purchase").select("event_id", "user_id", "ts")
    val r = ev.filter(col("event_type") === "signup").select("event_id", "user_id", "ts")
    val df = AsofJoin.native(l, r, Seq("user_id"), "ts", "ts", "event_id",
      Seq("event_id"), "last_signup_id")
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("AsofJoin"), p.take(600))
    assert(!p.contains("Window"), p.take(600))
    assert(!p.contains("Union"), p.take(600))
    // exactly the two co-partitioning exchanges (one per side)
    assert("Arguments: hashpartitioning".r.findAllIn(p).length == 2, p)
  }

  test("output ordering/partitioning pass through: downstream per-key agg adds no exchange") {
    val ev = Tables.events(spark, sf)
    val l = ev.filter(col("event_type") === "purchase").select("event_id", "user_id", "ts")
    val r = ev.filter(col("event_type") === "signup").select("event_id", "user_id", "ts")
    val joinedAgg = AsofJoin.native(l, r, Seq("user_id"), "ts", "ts", "event_id",
        Seq("event_id"), "last_signup_id")
      .groupBy("user_id").agg(count(lit(1)).as("n"))
    val p = joinedAgg.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // the group-by reuses the join's hash partitioning: still only 2
    assert("Arguments: hashpartitioning".r.findAllIn(p).length == 2, p)
  }
}
