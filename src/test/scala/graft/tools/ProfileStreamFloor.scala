package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Adjudicate the streaming-family bench floor (round-9 verdict #6):
  * run `streaming_daily_metrics` end-to-end and split its wall time
  * into per-micro-batch machinery (trigger bookkeeping, offset/WAL
  * commits, state-store commits) vs actual data work (addBatch), plus
  * the outside-the-stream costs (staging, stream start/stop, terminal
  * compaction). The same data's batch twin (`metar_daily_metrics`
  * shape) is timed for reference. Prints one JSON line.
  */
object ProfileStreamFloor {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.prepare(spark)

    val progress =
      new java.util.concurrent.ConcurrentLinkedQueue[
        (Long, java.util.Map[String, java.lang.Long])]()
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit =
        progress.add((e.progress.batchId, e.progress.durationMs))
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    })

    // warm the staging memo + JVM so the measured run is steady-state
    graft.streaming.Streams.dailyMetrics(spark, sf).count()

    val t0 = System.nanoTime()
    progress.clear()
    val n = graft.streaming.Streams.dailyMetrics(spark, sf).count()
    val wallSec = (System.nanoTime() - t0) / 1e9
    Thread.sleep(2000) // listener events are async

    import scala.jdk.CollectionConverters._
    val rows = progress.asScala.toSeq.sortBy(_._1)
    def ms(m: java.util.Map[String, java.lang.Long], k: String): Long =
      Option(m.get(k)).map(_.longValue).getOrElse(0L)
    val perBatch = rows.map { case (id, m) =>
      val trig = ms(m, "triggerExecution")
      val add = ms(m, "addBatch")
      (id, trig, add, trig - add)
    }
    val totTrig = perBatch.map(_._2).sum / 1000.0
    val totAdd = perBatch.map(_._3).sum / 1000.0
    val totOther = perBatch.map(_._4).sum / 1000.0
    // split the machinery into its reported components
    val comps = Seq("latestOffset", "getBatch", "queryPlanning",
      "walCommit", "commitOffsets")
    val compSums = comps.map(k =>
      k -> rows.map { case (_, m) => ms(m, k) }.sum / 1000.0)
    println(s"""{"query":"streaming_daily_metrics","sf":"$sf","rows":$n,""" +
      s""""wall_sec":${f"$wallSec%.2f"},"batches":${perBatch.length},""" +
      s""""trigger_sec":${f"$totTrig%.2f"},"addbatch_sec":${f"$totAdd%.2f"},""" +
      s""""machinery_sec":${f"$totOther%.2f"},""" +
      compSums.map { case (k, v) => s""""${k}_sec":${f"$v%.2f"},""" }.mkString +
      s""""outside_stream_sec":${f"${wallSec - totTrig}%.2f"},""" +
      s""""per_batch":[${perBatch.map(b =>
        s"""{"id":${b._1},"trigger_ms":${b._2},"addbatch_ms":${b._3}}""")
        .mkString(",")}]}""")
    spark.stop()
  }
}
