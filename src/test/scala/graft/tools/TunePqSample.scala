package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.{Pq, Similarity}
// scratch sweep of the codebook-training hash-sample threshold
object TunePqSample {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.prepare(spark)
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.1")) {
      val emb = graft.Tables.embeddings(spark, sf).cache()
      val q = emb.filter(col("vec_id") < 100)
      val bf = Similarity.bruteForceTopK(q, emb, "vec_id", "vec_id", "embedding", 10)
        .select("q_id", "neighbor_id").cache()
      val nBf = bf.count()
      println(s"== $sf corpus=${emb.count()} bf@10 rows: $nBf")
      val corpus = emb.withColumn("_cell2",
        col("label") * 4 + pmod(col("vec_id"), lit(4)))
      for (hex <- Seq("", "7f", "4c", "32", "19")) {
        // time 3 runs of the full one-shot path, report median-ish 2nd
        var times = List.empty[Double]
        var recall = 0.0
        for (_ <- 1 to 3) {
          val t0 = System.nanoTime()
          val pq = Pq.adcTopK(q, corpus, "vec_id", "vec_id", "embedding",
            blockCol = "_cell2", m = 32, k = 10, dim = 64, trainHex = hex)
            .select("q_id", "neighbor_id")
          val hits = pq.join(bf, Seq("q_id", "neighbor_id")).count()
          times ::= (System.nanoTime() - t0) / 1e9
          recall = hits.toDouble / nBf
        }
        val med = times.sorted.apply(1)
        val all = times.sorted.map(t => f"$t%.2f").mkString(",")
        println(f"hex='$hex' recall@10=$recall%.3f median=$med%.2f s ($all)")
      }
    }
    spark.stop()
  }
}
