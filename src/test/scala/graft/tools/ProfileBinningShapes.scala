package graft.tools

import org.apache.spark.sql.DataFrame

/** A/B for binning_equidepth (r16): the per-group percent_rank window
  * (one task per event_type) vs the value-sharded rank (rank() within
  * (group, floor(value)) slices + driver offsets — the sweep's
  * fixed-key parallelism fix applied to an ordered rank).
  */
object ProfileBinningShapes {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("GRAFT_AB_DIR", "/tmp/graft-scale/x30")
    val reps = sys.env.getOrElse("GRAFT_AB_REPS", "6").toInt
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)

    def sharded(): DataFrame =
      graft.queries.AnalyticsQueries.binningEquidepth(spark, dir)
    def window(): DataFrame =
      graft.queries.AnalyticsQueries.binningEquidepthWindow(spark, dir)

    def time(f: => DataFrame): Double = {
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    time(window()); time(sharded())
    (1 to reps).foreach { r =>
      val a = time(window()); val b = time(sharded())
      println(f"""{"rep":$r,"window":$a%.2f,"sharded":$b%.2f}""")
    }
    val d1 = window(); val d2 = sharded()
    val eq = d1.exceptAll(d2).count() + d2.exceptAll(d1).count()
    println(s"""{"equal":${eq == 0L}}""")
    spark.stop()
  }
}
