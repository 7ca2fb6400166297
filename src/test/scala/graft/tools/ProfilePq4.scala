package graft.tools
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.Pq
import graft.functions.Vectors
// scratch: ADC scoring variants — where do the µs/pair go?
object ProfilePq4 {
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
    val qlutNested = subsOf(queries, "vec_id")
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
    val qlutFlat = qlutNested
      .select(col("q_id"), flatten(col("_lut")).as("_flut"),
        size(element_at(col("_lut"), 1)).as("_ncw"))
      .localCheckpoint()
    for (rnd <- 1 to 2) {
      println(s"-- round $rnd")
      t("join.count only") {
        codes.join(broadcast(qlutNested), col("q_id") =!= col("c_id")).count()
      }
      val adcNested: Column = (0 until m).map(s =>
          element_at(element_at(col("_lut"), s + 1),
            element_at(col("_codes"), s + 1).cast("int") + 1))
        .reduce(_ + _)
      t("nested element_at agg") {
        codes.join(broadcast(qlutNested), col("q_id") =!= col("c_id"))
          .withColumn("_adc", adcNested)
          .agg(sum(col("_adc"))).collect()
      }
      val adcFlat: Column = (0 until m).map(s =>
          element_at(col("_flut"),
            (lit(s) * col("_ncw")
              + element_at(col("_codes"), s + 1).cast("int") + 1)))
        .reduce(_ + _)
      t("flat element_at agg") {
        codes.join(broadcast(qlutFlat), col("q_id") =!= col("c_id"))
          .withColumn("_adc", adcFlat)
          .agg(sum(col("_adc"))).collect()
      }
      val adcHof: Column = aggregate(
        zip_with(col("_codes"), col("_lut"),
          (c, l) => element_at(l, c.cast("int") + 1)),
        lit(0.0), (acc, v) => acc + v)
      t("hof zip agg") {
        codes.join(broadcast(qlutNested), col("q_id") =!= col("c_id"))
          .withColumn("_adc", adcHof)
          .agg(sum(col("_adc"))).collect()
      }
    }
    spark.stop()
  }
}
