package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming realization of the reference's
  * orchestration-level streaming semantics (SURVEY §2.9):
  *
  *  - T1 30-min cron micro-batches → `Trigger.AvailableNow` (tests) /
  *    `Trigger.ProcessingTime` (production)
  *  - T3 high-watermark incremental state → `withWatermark` +
  *    checkpointed offsets
  *  - T5 latest-per-key snapshot (int layer) → `mapGroupsWithState`
  *  - T6 daily tumbling aggregate (dwh layer) → `window(ts, "1 day")`
  *
  * Each runner executes the stream to completion against the file
  * source and returns the result as a DataFrame, so batch oracles can
  * check streaming output — semantic equivalence of the two modes is
  * part of the engine's contract (SURVEY §7.4).
  */
object Streams {

  /** Events schema as the parquet reader sees it (ts = raw TIMESTAMP
    * NANOS int64, converted after read — see graft.Tables).
    */
  val eventsRawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)

  /** Streaming read of the events table (micro-batched file source).
    * The file source requires a directory, so the single parquet file
    * is staged into a temp dir (in production the landing zone IS a
    * directory that micro-batches arrive into).
    */
  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val staged = Files.createTempDirectory("graft-stream-src")
    Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      staged.resolve("events.parquet"))
    spark.readStream
      .schema(eventsRawSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(staged.toString)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  private def runToTable(df: DataFrame, mode: String): DataFrame = {
    val spark = df.sparkSession
    val name = "graft_stream_" + java.util.UUID.randomUUID.toString.replace("-", "")
    val ckpt = Files.createTempDirectory("graft-ckpt").toString
    val q = df.writeStream
      .format("memory").queryName(name).outputMode(mode)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }

  /** T6: daily tumbling-window aggregate per user with a 1-day
    * watermark — the streaming twin of the batch daily mart (same
    * oracle must match both).
    */
  def dailyMetrics(spark: SparkSession, dir: String): DataFrame = {
    val agg = eventsStream(spark, dir)
      .withWatermark("ts", "1 day")
      .groupBy(col("user_id"), window(col("ts"), "1 day"))
      .agg(
        round(avg(col("value")), 4).as("avg_value"),
        max(col("value")).as("max_value"),
        min(col("value")).as("min_value"),
        count(lit(1)).as("n_events"))
    runToTable(agg, "complete")
      .withColumn("day", to_date(col("window.start")))
      .withColumn("user_id_date",
        concat(col("user_id").cast("string"), lit("_"),
          date_format(col("day"), "yyyyMMdd")))
      .select("user_id", "day", "avg_value", "max_value", "min_value",
        "n_events", "user_id_date")
      .orderBy("user_id", "day")
  }

  /** Session windows (gap-based) in streaming — the streaming twin of
    * the batch [[graft.operators.Sessionize]] operator. Returns one row
    * per (user, session window) with event count and value sum.
    */
  def sessionWindows(spark: SparkSession, dir: String, gap: String = "30 minutes"): DataFrame = {
    val agg = eventsStream(spark, dir)
      .withWatermark("ts", "1 day")
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("session_value"))
    runToTable(agg, "complete")
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("n_events"), col("session_value"))
      .orderBy("user_id", "session_start")
  }

  /** T4: streaming exactly-once-per-id via dropDuplicates within the
    * watermark + idempotent merge sink (`foreachBatch` →
    * [[graft.operators.MergeWriter]]) — the reference's
    * collector→upsert path as a real stream. Returns the final merged
    * table.
    */
  def dedupToMergeSink(spark: SparkSession, dir: String, targetDir: String): DataFrame = {
    val deduped = eventsStream(spark, dir)
      .withWatermark("ts", "1 day")
      .dropDuplicates("event_id")
    val ckpt = Files.createTempDirectory("graft-ckpt").toString
    val q = deduped.writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.operators.MergeWriter.upsert(batch.sparkSession, targetDir,
          batch, keys = Seq("event_id"), versionCols = Seq("ts"))
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.parquet(targetDir)
  }

  /** Watermarked stream-stream inner join: purchases joined to the
    * same user's signups within the preceding hour. Both sides carry
    * watermarks so the join state is bounded (old rows age out) — the
    * streaming analogue of the batch range join.
    */
  def purchasesAfterSignups(spark: SparkSession, dir: String): DataFrame = {
    val base = eventsStream(spark, dir)
    val purchases = base.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    val signups = base.filter(col("event_type") === "signup")
      .select(col("event_id").as("s_id"), col("user_id").as("s_user"),
        col("ts").as("s_ts"))
      .withWatermark("s_ts", "1 hour")
    val joined = purchases.join(signups,
      expr("""user_id = s_user AND
             |p_ts >= s_ts AND p_ts <= s_ts + INTERVAL 1 HOUR""".stripMargin))
    runToTable(joined, "append")
      .select(col("p_id"), col("user_id"), col("s_id"))
      .orderBy("p_id", "s_id")
  }

  /** T5: latest event per user via explicit keyed state
    * (`mapGroupsWithState`) — the streaming twin of the batch
    * latest-per-key. Emits the current best per key each micro-batch;
    * the final state is recovered by a keep-latest reduction over the
    * update log (update-mode memory sink appends per-batch rows).
    */
  def latestPerKey(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val evs: Dataset[Ev] = eventsStream(spark, dir)
      .select("event_id", "ts", "user_id", "event_type", "value").as[Ev]

    def newer(a: Ev, b: Ev): Ev = {
      val c = a.ts.compareTo(b.ts)
      if (c > 0 || (c == 0 && a.event_id > b.event_id)) a else b
    }
    val updates = evs
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (_: Long, it: Iterator[Ev], state: GroupState[Ev]) =>
          val best = (state.getOption.iterator ++ it).reduce(newer)
          state.update(best)
          best
      }
    val updateLog = runToTable(updates.toDF(), "update")
    graft.operators.LatestPerKey(updateLog,
        keys = Seq("user_id"), orderCols = Seq("ts", "event_id"))
      .select("user_id", "event_id", "event_type", "value")
      .orderBy("user_id")
  }
}
