package graft.tools
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ext.Pq
import graft.functions.Vectors
// scratch micro-profiler: where does adcProbe's time go?
object ProfilePq3 {
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
    val cb = Pq.trainCodebook(
      graft.ext.Sampling.sample(corpus, col("vec_id"), lit("32")),
      "embedding", "_cell", m, 64).localCheckpoint()
    val codes = Pq.encode(emb, "vec_id", "embedding", cb, m, 64)
      .localCheckpoint()
    val queries = emb.filter(col("vec_id") < 100)
    def subsOf(df: DataFrame, id: String): DataFrame =
      Vectors.unitized(df, "embedding", id -> id)
        .select(col(id), posexplode(array((0 until m).map(s =>
          slice(col("_uv"), s * w + 1, w)): _*)).as(Seq("sub", "_sv")))
    for (rnd <- 1 to 2) {
      println(s"-- round $rnd")
      var qlut: DataFrame = null
      t("qlut.ckpt") {
        qlut = subsOf(queries, "vec_id")
          .withColumnRenamed("vec_id", "q_id")
          .join(broadcast(cb), Seq("sub"))
          .withColumn("_dp", Vectors.dot(col("_sv"), col("_cw")))
          .groupBy(col("q_id"), col("sub"))
          .agg(array_sort(collect_list(struct(col("cw"), col("_dp")))).as("_cd"))
          .withColumn("_l", transform(col("_cd"), s => s.getField("_dp")))
          .groupBy(col("q_id"))
          .agg(array_sort(collect_list(struct(col("sub"), col("_l")))).as("_sl"))
          .select(col("q_id"),
            transform(col("_sl"), s => s.getField("_l")).as("_lut"))
          .localCheckpoint()
      }
      val adc: org.apache.spark.sql.Column = (0 until m).map(s =>
          element_at(element_at(col("_lut"), s + 1),
            element_at(col("_codes"), s + 1).cast("int") + 1))
        .reduce(_ + _)
      t("join+adc.agg") {
        codes.join(broadcast(qlut), col("q_id") =!= col("c_id"))
          .withColumn("_adc", adc)
          .agg(sum(col("_adc"))).collect()
      }
      t("join+adc+window.collect") {
        val rankW = Window.partitionBy(col("q_id"))
          .orderBy(round(col("_adc"), 9).desc, col("c_id").asc)
        codes.join(broadcast(qlut), col("q_id") =!= col("c_id"))
          .withColumn("_adc", adc)
          .withColumn("rank", row_number().over(rankW).cast("long"))
          .filter(col("rank") <= 3)
          .select(col("q_id"), col("rank"), col("c_id").as("neighbor_id"),
            round(col("_adc"), 6).as("adc_cosine")).collect()
      }
      t("full adcProbe.collect") {
        Pq.adcProbe(queries, "vec_id", "embedding", cb, codes, m, 64, 3)
          .collect()
      }
    }
    spark.stop()
  }
}
