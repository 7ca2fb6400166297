package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A/B for text_perplexity: lazy recompute vs localCheckpoint of the
  * bigram/term count pass (three consumers, unlike tfidf's two).
  */
object ProfilePerplexVariants {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("GRAFT_AB_DIR", "/tmp/graft-scale/x30")
    val reps = sys.env.getOrElse("GRAFT_AB_REPS", "5").toInt
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val docs = graft.Tables.documents(spark, dir)
    val toks = graft.functions.Text.tokens(col("text"))

    def perplex(ckpt: Boolean): DataFrame = {
      val pc0 = docs.select(col("doc_id"),
        call_function("graft_bigram_counts", toks).as("bc"),
        call_function("graft_term_counts", toks).as("tc"))
      val pc = if (ckpt) pc0.localCheckpoint() else pc0
      val ex = pc.select(explode(col("bc")).as("e"))
      val c2 = ex.groupBy(col("e.bg").as("bg")).agg(sum(col("e.c")).as("c2"))
      val c1 = ex.groupBy(col("e.w1").as("w1")).agg(sum(col("e.c")).as("c1"))
      val v = pc.select(explode(col("tc")).as("t"))
        .agg(countDistinct(col("t.term")).as("vs"))
      val model = c2
        .agg(sort_array(collect_list(struct(col("bg"), col("c2")))).as("c2arr"))
        .crossJoin(c1.agg(sort_array(collect_list(struct(col("w1"), col("c1"))))
          .as("c1arr")))
        .crossJoin(v)
        .select(struct(col("c2arr"), col("c1arr"), col("vs")).as("model"))
      pc.crossJoin(broadcast(model))
        .select(col("doc_id"),
          call_function("graft_perplexity", col("bc"), col("model")).as("s"))
        .select(col("doc_id"),
          coalesce(col("s.n_bigrams"), lit(0L)).as("n_bigrams"),
          col("s.avg_nll").as("avg_nll"))
    }

    def time(f: => DataFrame): Double = {
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def prod(): DataFrame =
      graft.SparkEntry.queries("text_perplexity")(spark, dir)
    time(perplex(false)); time(perplex(true)); time(prod())
    (1 to reps).foreach { r =>
      val a = time(prod())
      val b = time(perplex(true))
      val c = time(perplex(false))
      println(f"""{"rep":$r,"prod_derived_c1":$a%.2f,"old_ckpt":$b%.2f,"old_lazy":$c%.2f}""")
    }
    spark.stop()
  }
}
