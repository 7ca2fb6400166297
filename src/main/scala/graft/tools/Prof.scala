package graft.tools

import org.apache.spark.sql.functions._

/** Scratch profiling main (dev tool). */
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = GraftSessionLike.local(32)
    val dir = "/root/testdata/sf0.1"
    println("===== BEFORE (3-pass twin) =====")
    graft.queries.AnalyticsQueries.outlierMadJoined(spark, dir).explain("formatted")
    println("===== AFTER (one-pass) =====")
    graft.queries.AnalyticsQueries.defs("outlier_mad")(spark, dir).explain("formatted")
    spark.stop()
  }
}

object GraftSessionLike {
  def local(n: Int): org.apache.spark.sql.SparkSession = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$n]")
      .config("spark.sql.shuffle.partitions", n.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.prepare(spark)
    spark
  }
}
