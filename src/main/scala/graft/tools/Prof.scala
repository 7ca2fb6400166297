package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft._
import graft.operators.LatestPerKey

/** Scratch profiling main (dev tool). */
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    val dir = "/root/testdata/sf0.1"
    spark.read.parquet(s"$dir/lineitem.parquet").count() // warm
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(s"PROF $label: ${(System.nanoTime() - t0) / 1e9}")
      r
    }
    def pipeline() = {
      val ev = Tables.events(spark, dir)
        .withColumn("event_date", to_date(date_trunc("day", col("ts"))))
        .select("user_id", "event_date", "ts", "event_id", "event_type", "value")
        .filter(col("event_date") < "2024-01-11")
      LatestPerKey(ev.withColumn("_src", lit(1)),
        Seq("user_id", "event_date"), Seq("ts", "event_id", "_src")).drop("_src")
    }
    for (round <- 1 to 2) {
      time(s"r$round agg count") { pipeline().count() }
      time(s"r$round plain write") {
        pipeline().write.mode("overwrite")
          .parquet(Files.createTempDirectory("p").resolve("t").toString)
      }
      time(s"r$round partitionBy only") {
        pipeline().write.mode("overwrite").partitionBy("event_date")
          .parquet(Files.createTempDirectory("p").resolve("t").toString)
      }
      time(s"r$round repart+partitionBy") {
        pipeline().repartition(col("event_date")).write.mode("overwrite")
          .partitionBy("event_date")
          .parquet(Files.createTempDirectory("p").resolve("t").toString)
      }
    }
    spark.stop()
  }
}
