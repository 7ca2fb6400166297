package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Isolated A/B of the shard-append manifest forms (r21): per applied
  * micro-batch the sink pays one manifest WRITE (its sealed-shard
  * count) and one offset READ (sum of earlier batches' counts).
  *
  *  - old: 1-row parquet written via a Spark job (dynamic partition
  *    overwrite on b) + a Spark scan/filter/agg job for the offset;
  *  - new: a driver-side Hadoop-FS JSON file per batch + a driver-side
  *    listing read ([[graft.streaming.Streams.writeShardManifest]] /
  *    readShardManifest).
  *
  * Alternating reps over a 3-batch sequence (the declared query's
  * cadence), canaries at both ends. The delta × batches is the exact
  * slice the r21 change removes from `streaming_shard_append`.
  */
object ProfileShardManifest {
  def main(args: Array[String]): Unit = {
    val runs = sys.env.getOrElse("GRAFT_AB_RUNS", "7").toInt
    val spark = Harness.session()
    import spark.implicits._

    def oldSeq(): Double = {
      val counts = Files.createTempDirectory("graft-mf-old")
        .resolve("counts").toString
      Harness.time {
        (0L to 2L).foreach { id =>
          val countsPath = new org.apache.hadoop.fs.Path(counts)
          val fs = countsPath.getFileSystem(
            spark.sparkContext.hadoopConfiguration)
          val offset =
            if (!fs.exists(countsPath)) 0L
            else spark.read.parquet(counts)
              .filter(col("b") < id)
              .agg(coalesce(sum(col("shards")), lit(0L)))
              .head().getLong(0)
          require(offset >= 0)
          Seq((id, id + 1)).toDF("b", "shards")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("b").parquet(counts)
        }
      }
    }

    def newSeq(): Double = {
      val counts = Files.createTempDirectory("graft-mf-new")
        .resolve("counts").toString
      Harness.time {
        (0L to 2L).foreach { id =>
          val offset = graft.streaming.Streams
            .readShardManifest(spark, counts)
            .collect { case (b, n) if b < id => n }.sum
          require(offset >= 0)
          graft.streaming.Streams.writeShardManifest(
            spark, counts, id, id + 1)
        }
      }
    }

    oldSeq(); newSeq() // warm both paths
    val c0 = graft.Bench.canary(spark, 32)
    val o = new scala.collection.mutable.ArrayBuffer[Double]
    val n = new scala.collection.mutable.ArrayBuffer[Double]
    (1 to runs).foreach { _ => o += oldSeq(); n += newSeq() }
    val c1 = graft.Bench.canary(spark, 32)
    def med(a: Seq[Double]) = a.sorted.apply((a.length - 1) / 2)
    println(f"""{"canary":[$c0%.3f,$c1%.3f],"old_3batch_med":${med(o.toSeq)}%.3f,"new_3batch_med":${med(n.toSeq)}%.3f,"old":[${o.map(x => f"$x%.3f").mkString(",")}],"new":[${n.map(x => f"$x%.3f").mkString(",")}]}""")
    spark.stop()
  }
}
