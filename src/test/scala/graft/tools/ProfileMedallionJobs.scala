package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Per-Spark-job split of `pipeline_medallion` / `pipeline_medallion_incr`
  * (r21): the rows are write-lifecycle-adjudicated, but the LAYER
  * BOOKKEEPING inside them (watermark sidecars, stat heads, check
  * passes) may be paying whole Spark jobs for metadata-sized work —
  * the same shape the shard-append manifest change removed. One warm
  * rep each, every job's wall seconds + callsite, plus the gap
  * (driver-side time between jobs).
  */
object ProfileMedallionJobs {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("GRAFT_AB_DIR", "/root/testdata/sf0.1")
    val spark = Harness.session()

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Double, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.put(e.jobId, (System.nanoTime(),
          Option(e.properties.getProperty("callSite.short")).getOrElse("?")))
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        Option(jobs.remove(e.jobId)).foreach { case (t0, cs) =>
          done.add((e.jobId, (System.nanoTime() - t0) / 1e9, cs))
        }
      }
    })

    def run(name: String): Double = {
      done.clear()
      val t = Harness.time {
        graft.SparkEntry.queries(name)(spark, sf)
          .write.format("noop").mode("overwrite").save()
      }
      Thread.sleep(500)
      import scala.jdk.CollectionConverters._
      val rows = done.asScala.toSeq.sortBy(_._1)
      val sum = rows.map(_._2).sum
      println(f"== $name wall=$t%.2f jobs=${rows.size} jobsum=$sum%.2f gap=${t - sum}%.2f")
      rows.foreach { case (id, s, cs) => println(f"  job $id%3d $s%6.3f  $cs") }
      t
    }

    spark.read.parquet(s"$sf/lineitem.parquet").count()
    run("pipeline_medallion") // warm (JIT, readers)
    run("pipeline_medallion")
    run("pipeline_medallion_incr")
    run("pipeline_medallion_incr")
    spark.stop()
  }
}
