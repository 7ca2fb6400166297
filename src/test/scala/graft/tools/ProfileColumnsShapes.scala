package graft.tools

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A/B for profile_columns (r16: 3.4 s vs twin 0.10 at 30× — not a
  * job floor): the multi-count_distinct agg plans an Expand (one
  * projection per distinct column + one for the plain aggregates), so
  * every event row is replicated 6× before partial aggregation. The
  * legs shape runs ONE single-distinct two-phase agg per column —
  * column-pruned scans, no Expand, all legs concurrent — plus one
  * plain agg for null/min/max, crossJoined into the same 1-row frame.
  */
object ProfileColumnsShapes {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("GRAFT_AB_DIR", "/tmp/graft-scale/x30")
    val reps = sys.env.getOrElse("GRAFT_AB_REPS", "6").toInt
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)

    val numeric = Seq("event_id", "user_id", "value", "ts_us")
    val strings = Seq("event_type")

    def ev: DataFrame = graft.Tables.events(spark, dir).select(
      col("event_id"), col("user_id"), col("value"), col("event_type"),
      unix_micros(col("ts")).as("ts_us"))

    def legs(): DataFrame = {
      val plainAggs: Seq[Column] =
        (numeric ++ strings).map(c => count(col(c)).as(s"${c}_nn")) ++
        numeric.flatMap(c => Seq(
          min(col(c)).cast("double").as(s"${c}_min"),
          max(col(c)).cast("double").as(s"${c}_max"))) ++
        strings.flatMap(c => Seq(
          min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max"))) :+
        count(lit(1)).as("_n")
      val base = ev.agg(plainAggs.head, plainAggs.tail: _*)
      val one = (numeric ++ strings).foldLeft(base) { (acc, c) =>
        acc.crossJoin(ev.agg(countDistinct(col(c)).as(s"${c}_nd")))
      }
      val rows = numeric.map(c => struct(
          lit(c).as("col_name"), col("_n").as("n_rows"),
          (col("_n") - col(s"${c}_nn")).as("n_null"),
          col(s"${c}_nd").as("n_distinct"),
          col(s"${c}_min").as("min_num"), col(s"${c}_max").as("max_num"),
          lit(null).cast("string").as("min_str"),
          lit(null).cast("string").as("max_str"))) ++
        strings.map(c => struct(
          lit(c).as("col_name"), col("_n").as("n_rows"),
          (col("_n") - col(s"${c}_nn")).as("n_null"),
          col(s"${c}_nd").as("n_distinct"),
          lit(null).cast("double").as("min_num"),
          lit(null).cast("double").as("max_num"),
          col(s"${c}_min").as("min_str"), col(s"${c}_max").as("max_str")))
      one.select(explode(array(rows: _*)).as("p"))
        .select(col("p.*"))
        .orderBy("col_name")
    }

    def prod(): DataFrame =
      graft.queries.OpsQueries.profileColumns(spark, dir)

    def time(f: => DataFrame): Double = {
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    time(prod()); time(legs())
    (1 to reps).foreach { r =>
      val a = time(prod()); val b = time(legs())
      println(f"""{"rep":$r,"prod":$a%.2f,"legs":$b%.2f}""")
    }
    val d1 = prod(); val d2 = legs()
    val eq = d1.exceptAll(d2).count() + d2.exceptAll(d1).count()
    println(s"""{"equal":${eq == 0L}}""")
    spark.stop()
  }
}
