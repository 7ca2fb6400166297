package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.SignLsh
import graft.functions.Vectors
// scratch tuner for sign-LSH bits/tables defaults, not shipped
object TuneSlsh {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.prepare(spark)
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.1")) {
      val emb = graft.Tables.embeddings(spark, sf).cache()
      val u = emb.select(col("vec_id"), Vectors.asDouble(col("embedding")).as("_v"))
        .withColumn("_n", Vectors.norm(col("_v")))
        .withColumn("_u", when(col("_n") > 0,
          transform(col("_v"), x => x / col("_n"))).otherwise(col("_v")))
        .select(col("vec_id"), col("_u")).cache()
      val a = u.select(col("vec_id").as("id_a"), col("_u").as("_ua"))
      val b = u.select(col("vec_id").as("id_b"), col("_u").as("_ub"))
      val exact = a.join(b, col("id_a") < col("id_b"))
        .filter(round(Vectors.dot(col("_ua"), col("_ub")), 4) >= 0.25)
        .select("id_a", "id_b").cache()
      val nExact = exact.count()
      println(s"== $sf exact pairs (cos>=0.25): $nExact")
      for ((bits, tables) <- Seq((8, 4), (7, 8), (6, 8), (6, 12), (5, 8), (5, 12), (4, 8))) {
        val t0 = System.nanoTime()
        val pairs = SignLsh.nearDupPairsMulti(emb, "vec_id", "embedding",
          bits = bits, tables = tables, minCosine = 0.25, dim = 64)
        val hits = pairs.select("id_a", "id_b").join(exact, Seq("id_a", "id_b")).count()
        val n = pairs.count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"bits=$bits tables=$tables recall=${hits.toDouble / nExact}%.3f pairs=$n time=$sec%.1f s")
      }
    }
    spark.stop()
  }
}
