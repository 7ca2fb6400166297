package graft.tools

import org.apache.spark.sql.functions._

/** Cost split of the `similarity_recall` composite (round-10 verdict
  * #5): it is a six-pipeline DIAGNOSTIC (brute force, IVF, PQ, two
  * sign-LSH variants, exact cosine baseline) — time each component
  * alone and the full composite, so the composite's DuckDB ratio reads
  * as "sum of five ANN pipelines + an exact all-pairs baseline", not
  * as one slow query.
  */
object ProfileRecall {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32)
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import graft.ext.{Pq, SignLsh, Similarity}
    import graft.functions.Vectors
    val emb = graft.Tables.embeddings(spark, sf)
    emb.count() // warm
    def time(name: String)(f: => Unit): Unit = {
      val best = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min
      println(f"""{"component":"$name","sec":$best%.2f}""")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val queries = emb.filter(col("vec_id") < 100)
    val k = 10
    time("brute_force")(noop(
      Similarity.bruteForceTopK(queries, emb, "vec_id", "vec_id", "embedding", k)))
    time("ivf")(noop(
      Similarity.ivfTopK(queries, emb, "vec_id", "vec_id", "embedding",
        blockCol = "label", k = k, nprobe = 3)))
    time("pq_train_encode_probe")(noop(
      Pq.adcTopK(queries,
        emb.withColumn("_pqcell", col("label") * 4 + pmod(col("vec_id"), lit(4))),
        "vec_id", "vec_id", "embedding", blockCol = "_pqcell", m = 32,
        k = k, dim = 64, trainHex = "32")))
    time("lsh_single")(noop(
      SignLsh.nearDupPairs(emb, "vec_id", "embedding", bits = 4,
        minCosine = 0.25, dim = 64)))
    time("lsh_multi")(noop(
      SignLsh.nearDupPairsMulti(emb, "vec_id", "embedding", bits = 6,
        tables = 12, minCosine = 0.25, dim = 64)))
    val qu = Vectors.unitized(queries, "embedding", "vec_id" -> "q_id")
      .withColumnRenamed("_uv", "_qu")
    val cu = Vectors.unitized(emb, "embedding", "vec_id" -> "neighbor_id")
      .withColumnRenamed("_uv", "_cu")
    time("exact_baseline")(noop(
      cu.join(broadcast(qu), col("q_id") =!= col("neighbor_id"))
        .filter(round(Vectors.dot(col("_qu"), col("_cu")), 4) >= 0.25)
        .select("q_id", "neighbor_id")))
    time("full_composite")(noop(
      graft.queries.SimilarityQueries.similarityRecall(spark, sf)))
    spark.stop()
  }
}
