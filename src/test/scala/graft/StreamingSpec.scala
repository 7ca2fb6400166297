package graft

import graft.queries.ParityQueries
import graft.streaming.Streams

/** Batch/streaming equivalence (SURVEY §7.4 risk: streaming
  * latest-per-key must match the batch int layer; streaming daily
  * windows must match the batch dwh layer).
  */
class StreamingSpec extends SparkSpec {

  test("streaming daily metrics == batch daily metrics") {
    val stream = Streams.dailyMetrics(spark, sf)
    val batch = ParityQueries.dailyMetrics(spark, sf)
    assert(stream.exceptAll(batch).isEmpty && batch.exceptAll(stream).isEmpty)
  }

  test("streaming latest-per-key == batch latest-per-key") {
    val stream = Streams.latestPerKey(spark, sf)
    val batch = ParityQueries.latestPerKey(spark, sf)
    assert(stream.exceptAll(batch).isEmpty && batch.exceptAll(stream).isEmpty)
  }
}
