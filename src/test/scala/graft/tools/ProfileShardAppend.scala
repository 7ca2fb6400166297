package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Multi-rep split for `streaming_shard_append` (VERDICT r20 #3):
  * alternating reps against the sibling `streaming_cdc` (same
  * 3-micro-batch cadence, merge-sink lifecycle) with canary stamps,
  * reporting wall / addBatch / machinery medians — the paired
  * protocol for judging the manifest and per-batch job changes.
  */
object ProfileShardAppend {
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
      Thread.sleep(1000)
      import scala.jdk.CollectionConverters._
      def ms(m: java.util.Map[String, java.lang.Long], k: String): Long =
        Option(m.get(k)).map(_.longValue).getOrElse(0L)
      val ps = progress.asScala.toSeq
      val add = ps.map(ms(_, "addBatch")).sum / 1000.0
      val trig = ps.map(ms(_, "triggerExecution")).sum / 1000.0
      (t, add, trig - add)
    }

    spark.read.parquet(s"$sf/lineitem.parquet").count()
    run("streaming_cdc"); run("streaming_shard_append")

    val c0 = graft.Bench.canary(spark, 32)
    graft.Bench.fsCanary()
    val f0 = graft.Bench.fsCanary()
    val sa = new scala.collection.mutable.ArrayBuffer[(Double, Double, Double)]
    val cdc = new scala.collection.mutable.ArrayBuffer[(Double, Double, Double)]
    (1 to runs).foreach { _ =>
      sa += run("streaming_shard_append")
      cdc += run("streaming_cdc")
    }
    val c1 = graft.Bench.canary(spark, 32)
    val f1 = graft.Bench.fsCanary()

    def med(a: Seq[Double]) = a.sorted.apply((a.length - 1) / 2)
    def fmt(a: Seq[(Double, Double, Double)]) =
      a.map { case (w, ab, m) => f"[$w%.2f,$ab%.2f,$m%.2f]" }.mkString(",")
    println(f"""{"sf":"$sf","canary":[$c0%.3f,$c1%.3f],"fs_canary":[$f0%.3f,$f1%.3f],"shard_append_med":${med(sa.map(_._1).toSeq)}%.2f,"cdc_med":${med(cdc.map(_._1).toSeq)}%.2f,"shard_append_wall_addbatch_machinery":[${fmt(sa.toSeq)}],"cdc_wall_addbatch_machinery":[${fmt(cdc.toSeq)}]}""")
    spark.stop()
  }
}
