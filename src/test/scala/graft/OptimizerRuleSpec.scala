package graft

import graft.operators.LatestPerKey

/** LatestWindowToMaxBy: the rn=1 window idiom must rewrite to a
  * partially-aggregating max_by and still produce identical rows.
  */
class OptimizerRuleSpec extends SparkSpec {

  private lazy val ev = Tables.events(spark, sf)
    .select("user_id", "ts", "event_id", "event_type", "value")

  test("rn=1 descending window dedup rewrites to max_by") {
    val win = LatestPerKey.viaWindow(ev, Seq("user_id"), Seq("ts", "event_id"))
    val optimized = win.queryExecution.optimizedPlan.toString
    assert(optimized.contains("max_by"), optimized.take(600))
    assert(!optimized.contains("row_number"), optimized.take(600))
    val direct = LatestPerKey(ev, Seq("user_id"), Seq("ts", "event_id"))
    assert(win.exceptAll(direct).isEmpty && direct.exceptAll(win).isEmpty)
  }

  test("ascending order or rn > 1 do NOT rewrite") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val wAsc = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val first = ev.withColumn("_rn", row_number().over(wAsc))
      .filter(col("_rn") === 1).drop("_rn")
    assert(first.queryExecution.optimizedPlan.toString.contains("row_number"))

    val wDesc = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    val top2 = ev.withColumn("_rn", row_number().over(wDesc))
      .filter(col("_rn") <= 2).drop("_rn")
    assert(top2.queryExecution.optimizedPlan.toString.contains("row_number"))
    assert(top2.count() > ev.select("user_id").distinct().count())
  }
}
