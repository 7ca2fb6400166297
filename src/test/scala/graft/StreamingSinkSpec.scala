package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Sessionize
import graft.streaming.Streams

/** Streaming session windows and the stream→merge-sink path. */
class StreamingSinkSpec extends SparkSpec {

  test("streaming session windows == batch sessionize aggregation") {
    val stream = Streams.sessionWindows(spark, sf)
    val batch = Sessionize(Tables.events(spark, sf), "user_id", "ts", 1800,
        tieBreak = Seq("event_id"))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(min(col("ts")).as("session_start"),
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("session_value"))
      .select("user_id", "session_start", "n_events", "session_value")
    assert(stream.exceptAll(batch).isEmpty && batch.exceptAll(stream).isEmpty)
  }

  test("watermarked stream-stream join == batch interval join") {
    val stream = Streams.purchasesAfterSignups(spark, sf)
    val ev = Tables.events(spark, sf)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"), col("ts").as("p_ts"))
    val s = ev.filter(col("event_type") === "signup")
      .select(col("event_id").as("s_id"), col("user_id").as("s_user"),
        col("ts").as("s_ts"))
    val batch = p.join(s,
        col("user_id") === col("s_user") &&
          col("p_ts") >= col("s_ts") &&
          col("p_ts") <= col("s_ts") + expr("INTERVAL 1 HOUR"))
      .select("p_id", "user_id", "s_id")
    assert(stream.exceptAll(batch).isEmpty && batch.exceptAll(stream).isEmpty)
  }

  test("stream foreachBatch -> merge sink lands exactly the source rows") {
    val target = Files.createTempDirectory("graft-sink").resolve("t").toString
    val result = Streams.dedupToMergeSink(spark, sf, target)
    val source = Tables.events(spark, sf)
    assert(result.count() === source.count())
    assert(result.select("event_id").exceptAll(source.select("event_id")).isEmpty)
  }
}
