package graft.tools

import org.apache.spark.sql.SparkSession

/** Shared bootstrap for the measurement tools whose numbers land in
  * COVERAGE.md (ScaleCurve, MedallionSteady): one place for the
  * session config so the curves can never silently diverge in
  * methodology, and the bench-identical `time` helper.
  */
object Harness {

  def session(): SparkSession = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.prepare(spark)
    spark
  }

  def time(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }
}
