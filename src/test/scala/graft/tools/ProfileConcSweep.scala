package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Same-session A/B of the concurrency_sweep running-sum shapes at a
  * replicated scale (r15 verdict #2): A = the two-level prefix sum
  * (production, via SparkEntry.queries), B = the pre-r15 one-window-
  * partition-per-day form (inlined here as the baseline). Alternating
  * runs — never compare across sessions (host drift phases).
  *
  * Env: GRAFT_AB_DIR (default /tmp/graft-scale/x30), GRAFT_AB_REPS (3).
  */
object ProfileConcSweep {

  /** The pre-r15 shape: day-partitioned running-sum window. */
  private def oldSweep(spark: SparkSession, dir: String): DataFrame = {
    val dayUs = 86400000000L
    val ev = graft.Tables.events(spark, dir)
      .select(unix_micros(col("ts")).as("t"),
        (unix_micros(col("ts")) +
          round(col("value") * 60000000L).cast("long")).as("tEnd"))
    val slices = ev
      .select(col("t"), col("tEnd"),
        explode(sequence(
          to_date(timestamp_micros(col("t"))),
          to_date(timestamp_micros(col("tEnd"))))).as("day"))
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        greatest(col("t"), unix_micros(col("day").cast("timestamp")))
          .as("open_t"),
        least(col("tEnd"),
          unix_micros(col("day").cast("timestamp")) + lit(dayUs))
          .as("close_t"))
      .filter(col("open_t") < col("close_t"))
    val deltas = slices.select(col("day"), col("open_t").as("t"), lit(1L).as("d"))
      .unionAll(slices.select(col("day"), col("close_t").as("t"), lit(-1L).as("d")))
    val w = Window.partitionBy(col("day")).orderBy(col("t"), col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    deltas
      .withColumn("open", sum(col("d")).over(w))
      .groupBy(col("day"))
      .agg(sum(when(col("d") > 0, 1L).otherwise(0L)).as("n_active"),
        max(col("open")).as("peak_concurrency"))
      .orderBy("day")
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("GRAFT_AB_DIR", "/tmp/graft-scale/x30")
    val reps = sys.env.getOrElse("GRAFT_AB_REPS", "3").toInt
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    def time(f: => DataFrame): Double = {
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // warmup both once
    time(graft.SparkEntry.queries("concurrency_sweep")(spark, dir))
    time(oldSweep(spark, dir))
    val rows = (1 to reps).flatMap { r =>
      val a = time(graft.SparkEntry.queries("concurrency_sweep")(spark, dir))
      val b = time(oldSweep(spark, dir))
      Seq(f"""{"rep":$r,"two_level_sec":$a%.2f,"day_window_sec":$b%.2f}""")
    }
    rows.foreach(println)
    // equality check: both shapes must agree row-for-row
    val aDf = graft.SparkEntry.queries("concurrency_sweep")(spark, dir)
    val bDf = oldSweep(spark, dir)
    val diff = aDf.exceptAll(bDf).count() + bDf.exceptAll(aDf).count()
    println(s"""{"equal":${diff == 0L}}""")
    spark.stop()
  }
}
