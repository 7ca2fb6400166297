package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.streaming.Streams

class ShardAppendSpec extends SparkSpec {
  import spark.implicits._

  private def layout(data: String) =
    spark.read.parquet(data)
      .select(col("doc_id"), col("arrival_batch"),
        col("shard").cast("long").as("shard"), col("pos_in_shard"))
      .orderBy("doc_id").collect().toSeq

  test("shard append: ids continue across batches, none rewritten") {
    val root = Files.createTempDirectory("graft-sa").toString
    val (data, counts) = (s"$root/data", s"$root/counts")
    val b0 = (1L to 130L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val b1 = (201L to 280L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    Streams.applyShardBatch(b0, 0L, data, counts, docsPerShard = 50, "t0")
    val after0 = layout(data)
    // batch 0: 130 docs -> shards 0..2 (last partial)
    assert(after0.map(_.getLong(2)).distinct.sorted === Seq(0L, 1L, 2L))
    Streams.applyShardBatch(b1, 1L, data, counts, docsPerShard = 50, "t0")
    val after1 = layout(data)
    // batch 1 seals shards 3..4; batch 0's layout is byte-identical
    // (appended, never rewritten)
    assert(after1.filter(_.getLong(1) == 0L) === after0)
    assert(after1.map(_.getLong(2)).distinct.sorted === (0L to 4L))
  }

  test("shard append: a replayed batch overwrites exactly itself") {
    val root = Files.createTempDirectory("graft-sa-r").toString
    val (data, counts) = (s"$root/data", s"$root/counts")
    val b0 = (1L to 60L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val b1 = (101L to 170L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    Streams.applyShardBatch(b0, 0L, data, counts, 50, "t0")
    Streams.applyShardBatch(b1, 1L, data, counts, 50, "t0")
    val committed = layout(data)
    // crash-between-sink-and-checkpoint: batch 1 is applied AGAIN
    Streams.applyShardBatch(b1, 1L, data, counts, 50, "t0")
    assert(layout(data) === committed)
    // and still one file per shard dir after the replay
    val files = spark.read.parquet(data)
      .select(col("shard"), col("_metadata.file_path").as("_f"))
      .groupBy("shard").agg(countDistinct(col("_f")).as("n"))
      .filter(col("n") =!= 1L).count()
    assert(files === 0L)
  }
}
