package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

/** Floor of ONE minimal AvailableNow stream: stage a 1-row file, run a
  * trivial stateless pass-through to a foreachBatch noop, and split
  * wall into start (start() returns), batches (to last progress), and
  * stop (awaitTermination tail). Repeated so JVM init is visible in
  * run 1 and steady state in the rest — the floor the 11 bench streams
  * each pay regardless of data.
  */
object ProfileStreamStartStop {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.prepare(spark)
    import spark.implicits._

    val root = Files.createTempDirectory("graft-floor")
    Seq(1L).toDF("x").coalesce(1).write.parquet(root.resolve("d").toString)

    (1 to 5).foreach { i =>
      val ckptRoot = sys.env.get("GRAFT_FLOOR_CKPT")
        .map(java.nio.file.Paths.get(_)).getOrElse(root)
      val ckpt = Files.createTempDirectory(ckptRoot, "graft-floor-ckpt").toString
      val t0 = System.nanoTime()
      val q = spark.readStream.schema("x LONG")
        .parquet(root.resolve("d").toString)
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) => {
          b.write.format("noop").mode("overwrite").save(); ()
        })
        .trigger(Trigger.AvailableNow())
        .start()
      val tStarted = System.nanoTime()
      q.awaitTermination()
      val tDone = System.nanoTime()
      val rp = q.recentProgress
      val nb = rp.length
      val trig = rp.map(p => Option(p.durationMs.get("triggerExecution"))
        .map(_.longValue).getOrElse(0L)).sum
      import scala.jdk.CollectionConverters._
      val comps = rp.flatMap(_.durationMs.asScala)
        .groupBy(_._1).map { case (k, vs) => s""""$k":${vs.map(_._2.longValue).sum}""" }
        .toSeq.sorted.mkString(",")
      println(f"""{"run":$i,"wall":${(tDone - t0) / 1e9}%.3f,"start_call":${(tStarted - t0) / 1e9}%.3f,"batches":$nb,"trigger_sec":${trig / 1000.0}%.3f,"nonbatch_sec":${(tDone - t0) / 1e9 - trig / 1000.0}%.3f,$comps}""")
    }
    spark.stop()
  }
}
