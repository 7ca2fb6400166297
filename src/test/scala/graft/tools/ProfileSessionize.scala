package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Slice profile of streaming_sessionize (VERDICT r21 #3): staging /
  * stream run / terminal compaction+sort, with the
  * runToCompactedChangelog internals replicated inline so each slice
  * can be timed. Also times the plain 3-batch staging (the
  * streaming_daily_metrics config) to show what a shared range-split
  * would save the sentinel config.
  */
object ProfileSessionize {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("GRAFT_AB_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("GRAFT_AB_REPS", "3").toInt
    val spark = Harness.session()
    spark.read.parquet(s"$dir/events.parquet").count() // warm
    // streaming machinery warmup (mirrors Bench)
    locally {
      val warmDir = Files.createTempDirectory("graft-warm")
      import spark.implicits._
      Seq(1L).toDF("x").write.parquet(warmDir.resolve("d").toString)
      val q = spark.readStream.schema("x LONG").parquet(warmDir.resolve("d").toString)
        .groupBy("x").count()
        .writeStream.format("memory").queryName("graft_warmup")
        .outputMode("update")
        .option("checkpointLocation", warmDir.resolve("ckpt").toString)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    def time(f: => Unit): Double = Harness.time(f)

    // slice 1a: plain 3-batch staging (daily_metrics config) — first
    // construction pays the range split
    val tStageDaily = time {
      graft.streaming.Streams.eventsStream(spark, dir, batches = 3)
    }
    // slice 1b: sentinel staging (sessionize config) — today a FULL
    // second range split + sentinel writes
    val tStageSess = time {
      graft.streaming.Streams.eventsStream(spark, dir, batches = 3,
        flushSentinel = true)
    }

    val scratchRoot = {
      val shm = java.nio.file.Paths.get("/dev/shm")
      if (Files.isDirectory(shm) && Files.isWritable(shm)) shm
      else java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
    }
    def runOnce(): (Double, Double) = {
      val gap = "30 minutes"
      val agg = graft.streaming.Streams.eventsStream(spark, dir,
          batches = 3, flushSentinel = true)
        .withWatermark("ts", gap)
        .groupBy(col("user_id"), session_window(col("ts"), gap))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 2).as("session_value"))
        .select(col("user_id"), col("session_window.start").as("session_start"),
          col("n_events"), col("session_value"))
      val log = Files.createTempDirectory(scratchRoot, "graft-prof-sink")
        .resolve("log").toString
      val ckpt = Files.createTempDirectory(scratchRoot, "graft-prof-ckpt").toString
      val tRun = time {
        graft.operators.ShuffleWidth.withWidth(spark, _ => 4L) {
          val key = "spark.sql.streaming.noDataMicroBatches.enabled"
          val saved = spark.conf.get(key)
          spark.conf.set(key, "false")
          try {
            val q = agg.writeStream
              .outputMode("append")
              .option("checkpointLocation", ckpt)
              .foreachBatch { (batch: DataFrame, id: Long) =>
                graft.operators.MergeWriter.append(batch.sparkSession, log,
                  batch.withColumn("_batch_id", lit(id)))
              }
              .trigger(Trigger.AvailableNow())
              .start()
            q.awaitTermination()
            if (sys.env.get("GRAFT_AB_PROGRESS").nonEmpty)
              q.recentProgress.foreach { p =>
                println(s"PROGRESS batch=${p.batchId} rows=${p.numInputRows} " +
                  s"durations=${p.durationMs}")
              }
          } finally spark.conf.set(key, saved)
        }
      }
      def compact(): Unit =
        graft.operators.LatestPerKey(spark.read.parquet(log),
            Seq("user_id", "session_start"), Seq("n_events", "_batch_id"))
          .drop("_batch_id")
          .filter(col("user_id") >= 0)
          .select("user_id", "session_start", "n_events", "session_value")
          .orderBy("user_id", "session_start")
          .write.format("noop").mode("overwrite").save()
      val tCompact = time { compact() }
      val tCompact4 = time {
        graft.operators.ShuffleWidth.withWidth(spark, _ => 4L) { compact() }
      }
      println(f"PROF compact32=$tCompact%.2f compact4=$tCompact4%.2f")
      (tRun, tCompact)
    }
    runOnce() // warm
    val runs = (1 to reps).map(_ => runOnce())
    def med(a: Seq[Double]) = a.sorted.apply((a.length - 1) / 2)
    def fmt(a: Seq[Double]) = a.map(x => f"$x%.2f").mkString(",")
    println(f"""{"dir":"$dir","stage_daily":$tStageDaily%.2f,"stage_sessionize":$tStageSess%.2f,"run_med":${med(runs.map(_._1))}%.2f,"compact_med":${med(runs.map(_._2))}%.2f,"run":[${fmt(runs.map(_._1))}],"compact":[${fmt(runs.map(_._2))}]}""")
    spark.stop()
  }
}
