package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// scratch: is the index BUILD single-partition-bound on the one-file
// corpus scan? time the signing pass at 1x vs repartitioned width.
object ProfileLshBuild {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.prepare(spark)
    val docs = graft.Tables.documents(spark, sf)
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    def postings(df: org.apache.spark.sql.DataFrame) =
      graft.ext.Dedup.minhashBands(df, "doc_id", "text")
        .select(col("doc_id").as("c_id"),
          posexplode(col("bands")).as(Seq("band_idx", "band_key")))
    println("input partitions: " + corpus.rdd.getNumPartitions)
    // warmup
    time("warmup asIs")(postings(corpus).count())
    time("asIs")(postings(corpus).count())
    time("repart32")(postings(corpus.repartition(32)).count())
    time("asIs again")(postings(corpus).count())
    time("repart32 again")(postings(corpus.repartition(32)).count())
    spark.stop()
  }
}
