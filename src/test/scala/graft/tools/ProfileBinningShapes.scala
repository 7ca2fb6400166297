package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A/B for binning_equidepth, three generations of the same exact
  * answer:
  *  - window:    per-group percent_rank window (one task per
  *               event_type) — the twin-shaped baseline
  *  - sharded:   r16 rank() within (group, floor(value)) slices +
  *               driver offsets via broadcast pair join — parallel,
  *               but still exchanges EVERY row to rank it
  *  - selection: r18 production shape — bin boundaries are three
  *               per-group order statistics (Quantiles
  *               .groupedOrderStats), bin assignment is a map-side
  *               comparison, the only row-bearing exchange carries
  *               (group, bin)-grain partials
  */
object ProfileBinningShapes {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("GRAFT_AB_DIR", "/tmp/graft-scale/x30")
    val reps = sys.env.getOrElse("GRAFT_AB_REPS", "6").toInt
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)

    def ev: DataFrame = graft.Tables.events(spark, dir)
      .select(col("event_type"), col("value"),
        round(col("value") * 100).cast("long").as("cents"))

    def selection(): DataFrame =
      graft.queries.AnalyticsQueries.binningEquidepth(spark, dir)

    def window(): DataFrame =
      graft.queries.AnalyticsQueries.binningEquidepthWindow(spark, dir)

    // the retired r16 production shape, kept here for the A/B record
    def sharded(): DataFrame = {
      import spark.implicits._
      val evh = ev.withColumn("_h",
        coalesce(floor(col("value")), lit(Long.MinValue)))
      val totals = evh.groupBy(col("event_type"), col("_h"))
        .agg(count(lit(1)).as("_c")).collect()
      val offRows: Seq[(String, Long, Long, Long)] =
        totals.groupBy(_.getString(0)).toSeq.flatMap { case (g, rows) =>
          val n = rows.map(_.getLong(2)).sum
          var acc = 0L
          rows.sortBy(_.getLong(1)).toSeq.map { r =>
            val t = (g, r.getLong(1), acc, n); acc += r.getLong(2); t
          }
        }
      val off = broadcast(offRows.toDF("_og", "_oh", "_off", "_n"))
      val w = Window.partitionBy(col("event_type"), col("_h"))
        .orderBy(col("value"))
      evh.join(off,
          col("event_type") <=> col("_og") && col("_h") === col("_oh"))
        .withColumn("_r", rank().over(w) + col("_off"))
        .withColumn("bin", when(col("_n") === 1, lit(0L)).otherwise(
          least(floor((col("_r") - 1).cast("double") /
            (col("_n") - 1).cast("double") * 4), lit(3.0)).cast("long")))
        .groupBy(col("event_type"), col("bin"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("value")).as("lo"), max(col("value")).as("hi"),
          sum(col("cents")).as("bin_cents"))
        .orderBy("event_type", "bin")
    }

    def time(f: => DataFrame): Double = {
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    time(window()); time(sharded()); time(selection())
    (1 to reps).foreach { r =>
      val a = time(window()); val b = time(sharded())
      val c = time(selection())
      println(
        f"""{"rep":$r,"window":$a%.2f,"sharded":$b%.2f,"selection":$c%.2f}""")
    }
    val d1 = window(); val d2 = sharded(); val d3 = selection()
    val eq = d1.exceptAll(d2).count() + d2.exceptAll(d1).count() +
      d1.exceptAll(d3).count() + d3.exceptAll(d1).count()
    println(s"""{"equal":${eq == 0L}}""")
    spark.stop()
  }
}
