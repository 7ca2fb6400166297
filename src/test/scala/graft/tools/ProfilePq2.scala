package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.Pq
import graft.functions.Vectors
// scratch phase profiler for the current one-shot PQ path
object ProfilePq2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.prepare(spark)
    val dir = "/root/testdata/sf0.1"
    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      println(f"PHASE $name : ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    t("warmup") { spark.read.parquet(s"$dir/lineitem.parquet").count() }
    val emb = graft.Tables.embeddings(spark, dir)
    val corpus = emb.withColumn("_cell",
      col("label") * 4 + pmod(col("vec_id"), lit(4)))
    val (m, w) = (32, 2)
    for (round <- 1 to 2) {
      println(s"-- round $round")
      var sl: org.apache.spark.sql.DataFrame = null
      var cb: org.apache.spark.sql.DataFrame = null
      var codes: org.apache.spark.sql.DataFrame = null
      t("slices.ckpt") {
        sl = Vectors.unitized(corpus, "embedding", "vec_id" -> "c_id",
            "_cell" -> "_cell")
          .select(col("c_id"), col("_cell"),
            posexplode(array((0 until m).map(s =>
              slice(col("_uv"), s * w + 1, w)): _*)).as(Seq("sub", "_sv")))
          .localCheckpoint()
      }
      t("train.ckpt") {
        cb = Pq.trainCodebook(
          graft.ext.Sampling.sample(corpus, col("vec_id"), lit("32")),
          "embedding", "_cell", m, 64).localCheckpoint()
      }
      t("encode.ckpt") {
        codes = Pq.encode(emb, "vec_id", "embedding", cb, m, 64)
          .localCheckpoint()
      }
      t("probe.collect") {
        Pq.adcProbe(emb.filter(col("vec_id") < 100), "vec_id", "embedding",
          cb, codes, m, 64, k = 3).orderBy("q_id", "rank").collect()
      }
      t("oneshot.collect") {
        Pq.adcTopK(emb.filter(col("vec_id") < 100), corpus, "vec_id",
          "vec_id", "embedding", "_cell", m, 3, dim = 64, trainHex = "32")
          .orderBy("q_id", "rank").collect()
      }
    }
    spark.stop()
  }
}
// appended: parallelism check
object ProfilePq2b {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.prepare(spark)
    val dir = "/root/testdata/sf0.1"
    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      println(f"PHASE $name : ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    t("warmup") { spark.read.parquet(s"$dir/lineitem.parquet").count() }
    val emb = graft.Tables.embeddings(spark, dir)
    println("emb partitions: " + emb.rdd.getNumPartitions)
    val corpus = emb.withColumn("_cell",
      col("label") * 4 + pmod(col("vec_id"), lit(4)))
    val cb = Pq.trainCodebook(
      graft.ext.Sampling.sample(corpus, col("vec_id"), lit("32")),
      "embedding", "_cell", 32, 64).localCheckpoint()
    for (rnd <- 1 to 2) {
      t(s"encode r$rnd 1-part") {
        Pq.encode(emb, "vec_id", "embedding", cb, 32, 64).localCheckpoint()
      }
      t(s"encode r$rnd 32-part") {
        Pq.encode(emb.repartition(32), "vec_id", "embedding", cb, 32, 64)
          .localCheckpoint()
      }
    }
    spark.stop()
  }
}
