package graft.tools
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.Pq
import graft.functions.Vectors
// scratch: is the ADC stage codegen'd? print the executed plan
object ProfilePq5 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.prepare(spark)
    val dir = "/root/testdata/sf0.001"
    val emb = graft.Tables.embeddings(spark, dir)
    val corpus = emb.withColumn("_cell",
      col("label") * 4 + pmod(col("vec_id"), lit(4)))
    val m = 32
    val cb = Pq.trainCodebook(corpus, "embedding", "_cell", m, 64)
      .localCheckpoint()
    val codes = Pq.encode(emb, "vec_id", "embedding", cb, m, 64)
      .localCheckpoint()
    val probe = Pq.adcProbe(emb.filter(col("vec_id") < 100), "vec_id",
      "embedding", cb, codes, m, 64, 3)
    println(probe.queryExecution.executedPlan.toString.take(6000))
    spark.stop()
  }
}
