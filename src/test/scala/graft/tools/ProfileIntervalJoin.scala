package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Row-level adjudication for `streaming_interval_join` (VERDICT r20
  * #1): the committed r20 median moved 3.80 → 9.01 s on UNTOUCHED code
  * — beyond the ~22% fs-latency envelope the streaming class absorbed
  * — and was the round's one number with no row-level evidence.
  *
  * Protocol (ProfileRegionalJoin): one fresh session, alternating reps
  * of the interval join against a SIBLING streaming row
  * (`streaming_cdc` — same eventsStream(batches=3) source, same
  * changelog-sink machinery, stateful but single-sided), CPU + fs
  * canaries at both ends, and per-rep micro-batch splits (addBatch vs
  * trigger machinery) from the progress listener. If the interval join
  * tracks its sibling and the r19-era ~3.8 s level at clean canaries,
  * the 9.01 s median is adjudicated environmental (the fs envelope the
  * r21 fs canary now stamps); a reproducible 9 s at clean canaries
  * would instead point at the two-sided state-store commit path.
  */
object ProfileIntervalJoin {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("GRAFT_AB_DIR", "/root/testdata/sf0.1")
    val runs = sys.env.getOrElse("GRAFT_AB_RUNS", "5").toInt
    val spark = Harness.session()

    val progress =
      new java.util.concurrent.ConcurrentLinkedQueue[
        java.util.Map[String, java.lang.Long]]()
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit =
        progress.add(e.progress.durationMs)
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    })

    def run(name: String): (Double, Double, Double) = {
      progress.clear()
      val t = Harness.time {
        graft.SparkEntry.queries(name)(spark, sf)
          .write.format("noop").mode("overwrite").save()
      }
      while (spark.streams.active.nonEmpty) Thread.sleep(100)
      Thread.sleep(1000) // let the async listener bus drain
      import scala.jdk.CollectionConverters._
      def ms(m: java.util.Map[String, java.lang.Long], k: String): Long =
        Option(m.get(k)).map(_.longValue).getOrElse(0L)
      val ps = progress.asScala.toSeq
      val add = ps.map(ms(_, "addBatch")).sum / 1000.0
      val trig = ps.map(ms(_, "triggerExecution")).sum / 1000.0
      (t, add, trig - add)
    }

    // warmup: parquet reader + streaming machinery class-init (the
    // bench's own warmup shape), then one untimed rep of each query
    spark.read.parquet(s"$sf/lineitem.parquet").count()
    run("streaming_cdc"); run("streaming_interval_join")

    val c0 = graft.Bench.canary(spark, 32)
    graft.Bench.fsCanary()
    val f0 = graft.Bench.fsCanary()
    val ij = new scala.collection.mutable.ArrayBuffer[(Double, Double, Double)]
    val cdc = new scala.collection.mutable.ArrayBuffer[(Double, Double, Double)]
    (1 to runs).foreach { _ =>
      ij += run("streaming_interval_join")
      cdc += run("streaming_cdc")
    }
    val c1 = graft.Bench.canary(spark, 32)
    val f1 = graft.Bench.fsCanary()

    def med(a: Seq[Double]) = a.sorted.apply((a.length - 1) / 2)
    def fmt(a: Seq[(Double, Double, Double)]) =
      a.map { case (w, ab, m) => f"[$w%.2f,$ab%.2f,$m%.2f]" }.mkString(",")
    println(f"""{"sf":"$sf","canary":[$c0%.3f,$c1%.3f],"fs_canary":[$f0%.3f,$f1%.3f],"interval_join_med":${med(ij.map(_._1).toSeq)}%.2f,"cdc_med":${med(cdc.map(_._1).toSeq)}%.2f,"interval_join_wall_addbatch_machinery":[${fmt(ij.toSeq)}],"cdc_wall_addbatch_machinery":[${fmt(cdc.toSeq)}]}""")
    spark.stop()
  }
}
