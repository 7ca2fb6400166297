package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM, one session). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(4)
  val sf: String = "/root/testdata/sf0.001"

  /** Capture (result, jobCount, callSites) for Spark jobs started while
    * `f` runs — the no-hidden-sizing-jobs guard shared by the index and
    * LSH suites.
    */
  def jobsDuring[A](f: => A): (A, Int, Seq[String]) = {
    val sites = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        sites.add(Option(js.properties)
          .flatMap(p => Option(p.getProperty("callSite.short")))
          .getOrElse(""))
    }
    org.apache.spark.graft.TestBus.drain(spark.sparkContext)
    spark.sparkContext.addSparkListener(listener)
    try {
      val out = f
      org.apache.spark.graft.TestBus.drain(spark.sparkContext)
      (out, sites.size, sites.toArray(Array.empty[String]).toSeq)
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
