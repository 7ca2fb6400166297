package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.{Pq, Similarity}
// scratch tuner for PQ defaults, not shipped
object TunePq {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.prepare(spark)
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.1")) {
      val emb = graft.Tables.embeddings(spark, sf).cache()
      val q = emb.filter(col("vec_id") < 100)
      val bf = Similarity.bruteForceTopK(q, emb, "vec_id", "vec_id", "embedding", 10)
        .select("q_id", "neighbor_id").cache()
      val nBf = bf.count()
      println(s"== $sf bf@10 rows: $nBf")
      for (m <- Seq(16, 32, 64); split <- Seq(1, 2, 4)) {
        val t0 = System.nanoTime()
        val corpus = emb.withColumn("_cell2",
          col("label") * split + pmod(col("vec_id"), lit(split)))
        val pq = Pq.adcTopK(q, corpus, "vec_id", "vec_id", "embedding",
          blockCol = "_cell2", m = m, k = 10, dim = 64)
          .select("q_id", "neighbor_id")
        val hits = pq.join(bf, Seq("q_id", "neighbor_id")).count()
        println(f"m=$m split=$split recall@10=${hits.toDouble / nBf}%.3f time=${(System.nanoTime() - t0) / 1e9}%.1f s")
      }
    }
    spark.stop()
  }
}
