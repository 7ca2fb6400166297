package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Family-wide split of the streaming bench block (round-10 verdict
  * #3): for EVERY streaming_* query, wall time vs the sum of its
  * micro-batch addBatch (data work), per-batch machinery, and the
  * outside-the-stream remainder (staging, stream start/stop, terminal
  * compaction, result sort). Prints one JSON line per query plus a
  * family total — the map that says which lever (batch count, per-batch
  * floor, or start/stop) actually owns the cost.
  */
object ProfileStreamFamily {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.prepare(spark)

    val progress =
      new java.util.concurrent.ConcurrentLinkedQueue[
        java.util.Map[String, java.lang.Long]]()
    val streams = new java.util.concurrent.atomic.AtomicInteger
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit =
        streams.incrementAndGet()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit =
        progress.add(e.progress.durationMs)
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    })

    val family = graft.SparkEntry.queries.keys
      .filter(_.startsWith("streaming_")).toSeq.sorted
    // warmup: parquet reader + streaming machinery class-init
    spark.read.parquet(s"$sf/lineitem.parquet").count()
    graft.SparkEntry.queries(family.head)(spark, sf)
      .write.format("noop").mode("overwrite").save()

    import scala.jdk.CollectionConverters._
    var totWall = 0.0; var totAdd = 0.0; var totMach = 0.0
    val rows = family.map { name =>
      progress.clear(); streams.set(0)
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sf)
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      // drain: wait for the manager to report no active queries, then
      // give the async listener bus a beat — late events from a prior
      // query must not be cleared into the next one's bucket
      while (spark.streams.active.nonEmpty) Thread.sleep(100)
      Thread.sleep(1500)
      def ms(m: java.util.Map[String, java.lang.Long], k: String): Long =
        Option(m.get(k)).map(_.longValue).getOrElse(0L)
      val ps = progress.asScala.toSeq
      val add = ps.map(ms(_, "addBatch")).sum / 1000.0
      val trig = ps.map(ms(_, "triggerExecution")).sum / 1000.0
      totWall += wall; totAdd += add; totMach += (trig - add)
      (name, wall, ps.length, streams.get, add, trig - add, wall - trig)
    }
    rows.foreach { case (n, w, b, s, a, m, o) =>
      println(f"""{"q":"$n","wall":$w%.2f,"batches":$b,"streams":$s,"addbatch":$a%.2f,"machinery":$m%.2f,"outside":$o%.2f}""")
    }
    println(f"""{"q":"TOTAL","wall":$totWall%.2f,"addbatch":$totAdd%.2f,"machinery":$totMach%.2f,"outside":${totWall - totAdd - totMach}%.2f}""")
    spark.stop()
  }
}
