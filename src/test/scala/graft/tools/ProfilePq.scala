package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.Pq
// scratch profiler for the PQ phases, not shipped
object ProfilePq {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.prepare(spark)
    val dir = "/root/testdata/sf0.1"
    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      println(f"PHASE $name%-22s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    t("warmup") { spark.read.parquet(s"$dir/lineitem.parquet").count() }
    val emb = graft.Tables.embeddings(spark, dir)
    val corpus = emb.withColumn("_pqcell",
      col("label") * 4 + pmod(col("vec_id"), lit(4)))
    val cb = Pq.trainCodebook(corpus, "embedding", "_pqcell", 32, 64)
    t("train.count") { cb.count() }
    t("train.count2") { cb.count() }
    val cbc = cb.cache(); cbc.count()
    val codes = Pq.encode(emb, "vec_id", "embedding", cbc, 32, 64)
    t("encode.count") { codes.count() }
    t("encode.count2") { codes.count() }
    val codesC = codes.cache(); codesC.count()
    t("probe") {
      Pq.adcProbe(emb.filter(col("vec_id") < 100), "vec_id", "embedding",
        cbc, codesC, 32, 64, k = 3).count()
    }
    t("probe2") {
      Pq.adcProbe(emb.filter(col("vec_id") < 100), "vec_id", "embedding",
        cbc, codesC, 32, 64, k = 3).count()
    }
    t("full-adcTopK") {
      Pq.adcTopK(emb.filter(col("vec_id") < 100), corpus, "vec_id", "vec_id",
        "embedding", blockCol = "_pqcell", m = 32, k = 3, dim = 64).count()
    }
    spark.stop()
  }
}
