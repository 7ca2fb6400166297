package graft.tools

import org.apache.spark.sql.functions._

import graft.functions.Vectors

/** Candidate-stage isolation for the multi-table sign-LSH A/B: builds
  * the signature frame once (checkpointed), then times ONLY the
  * candidate generation — packed grouped stream vs posting-list
  * self-join — alternating in one session. Locates whether the full-
  * pipeline delta lives in the candidate stage or downstream.
  */
object ProfileSlshStages {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = sys.env.getOrElse("GRAFT_AB_RUNS", "3").toInt
    val cap = sys.env.getOrElse("GRAFT_GROUP_CAP", "4096").toInt
    val spark = Harness.session()
    val emb = graft.Tables.embeddings(spark, dir)
    val bits = 6; val tables = 12; val d = 64

    val e = Vectors.unitized(emb, "embedding", "vec_id" -> "vec_id")
      .withColumnRenamed("_uv", "_u")
    val planes = {
      import spark.implicits._
      (for {
        t <- 0 until tables
        (p, i) <- graft.ext.SignLsh.hyperplanes(bits, d, 42L + t).zipWithIndex
      } yield (t, i, p)).toDF("_t", "_p", "_plane")
    }
    val sig = e.select(col("vec_id"), col("_u"))
      .crossJoin(broadcast(planes))
      .withColumn("_bit",
        when(round(Vectors.dot(col("_u"), col("_plane")), 9) >= 0, lit("1"))
          .otherwise(lit("0")))
      .groupBy(col("vec_id"), col("_t"))
      .agg(concat_ws("", transform(
        array_sort(collect_list(struct(col("_p"), col("_bit")))),
        s => s.getField("_bit"))).as("_bucket"))
      .localCheckpoint()

    def packed() = graft.ext.Dedup.bucketCandidatesPacked(
      sig.select(col("_t"), col("_bucket"), col("vec_id")),
      Seq("_t", "_bucket"), "vec_id", groupCap = cap)
    def joined() = {
      val a = sig.select(col("_t"), col("_bucket"), col("vec_id").as("id_a"))
      val b = sig.select(col("_t"), col("_bucket"), col("vec_id").as("id_b"))
      a.join(b, Seq("_t", "_bucket"))
        .filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b").distinct()
    }

    def run(f: => org.apache.spark.sql.DataFrame): Double =
      Harness.time(f.write.format("noop").mode("overwrite").save())

    run(packed()); run(joined())
    val p = Array.fill(runs)(0.0)
    val j = Array.fill(runs)(0.0)
    (0 until runs).foreach { r =>
      p(r) = run(packed())
      j(r) = run(joined())
    }
    def med(a: Array[Double]) = a.sorted.apply((a.length - 1) / 2)
    println(f"""{"dir":"$dir","cap":$cap,"packed_med":${med(p)}%.2f,"joined_med":${med(j)}%.2f,"packed":[${p.map(x => f"$x%.2f").mkString(",")}],"joined":[${j.map(x => f"$x%.2f").mkString(",")}]}""")
    spark.stop()
  }
}
