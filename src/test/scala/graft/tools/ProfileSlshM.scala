package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.SignLsh
import graft.functions.Vectors
// scratch profiler for multi-table sign-LSH phases, not shipped
object ProfileSlshM {
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
    val e = emb.select(col("vec_id"), Vectors.asDouble(col("embedding")).as("_v"))
      .withColumn("_n", Vectors.norm(col("_v")))
      .withColumn("_u", when(col("_n") > 0,
        transform(col("_v"), x => x / col("_n"))).otherwise(col("_v")))
    val sig = e.select(col("vec_id"),
      posexplode(array((0 until 12).map(t =>
        SignLsh.signature(col("_u"), SignLsh.hyperplanes(6, 64, 42L + t))): _*))
        .as(Seq("_t", "_bucket")))
    t("signatures") { sig.count() }
    t("signatures2") { sig.count() }
    t("full-cold") {
      SignLsh.nearDupPairsMulti(emb, "vec_id", "embedding", 6, 12, 0.25, 64).count()
    }
    t("full-warm") {
      SignLsh.nearDupPairsMulti(emb, "vec_id", "embedding", 6, 12, 0.25, 64).count()
    }
    // alternative: planes as broadcast ROWS, one native dot per
    // (vector, plane), ordered-concat bits per (vector, table)
    import spark.implicits._
    val planeRows = (for {
      tb <- 0 until 12
      (p, i) <- SignLsh.hyperplanes(6, 64, 42L + tb).zipWithIndex
    } yield (tb, i, p)).toDF("_t", "_p", "_plane")
    val sig2 = e.select(col("vec_id"), col("_u"))
      .crossJoin(broadcast(planeRows))
      .withColumn("_bit",
        when(round(Vectors.dot(col("_u"), col("_plane")), 9) >= 0, "1")
          .otherwise("0"))
      .groupBy(col("vec_id"), col("_t"))
      .agg(concat_ws("", transform(
        array_sort(collect_list(struct(col("_p"), col("_bit")))),
        s => s.getField("_bit"))).as("_bucket"))
    t("sig2-rows-cold") { sig2.count() }
    t("sig2-rows-warm") { sig2.count() }
    spark.stop()
  }
}
