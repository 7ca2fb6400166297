package graft.tools
import org.apache.spark.sql.SparkSession
// scratch runner: prints the similarity_recall diagnostic at both the
// toy and bench SFs (the numbers the SimilaritySpec floors pin)
object RecallCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.prepare(spark)
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.1")) {
      println(s"== $sf")
      val t0 = System.nanoTime()
      graft.queries.SimilarityQueries.similarityRecall(spark, sf)
        .collect().foreach(r => println(f"  ${r.getString(0)}%-16s " +
          f"n_exact=${r.getLong(1)} n_hit=${r.getLong(2)} " +
          f"recall=${r.getDouble(3)}%.4f"))
      println(f"  (${(System.nanoTime() - t0) / 1e9}%.1f s)")
    }
    spark.stop()
  }
}
