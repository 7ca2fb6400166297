package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A/B for text_perplexity: production (two independent folds off the
  * checkpoint) vs a GROUPING SETS single-exchange model build (c2 and
  * c1 from one pass, split in the fold via grouping_id; collect_list
  * skips the null side).
  */
object ProfilePerplexGsets {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("GRAFT_AB_DIR", "/tmp/graft-scale/x30")
    val reps = sys.env.getOrElse("GRAFT_AB_REPS", "5").toInt
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val docs = graft.Tables.documents(spark, dir)
    val toks = graft.functions.Text.tokens(col("text"))

    def gsets(): DataFrame = {
      val pc = docs.select(col("doc_id"),
        call_function("graft_bigram_counts", toks).as("bc"),
        call_function("graft_term_counts", toks).as("tc"))
        .localCheckpoint()
      val ex = pc.select(explode(col("bc")).as("e"))
        .select(col("e.bg").as("bg"), col("e.w1").as("w1"), col("e.c").as("c"))
      val g = ex.groupingSets(Seq(Seq(col("bg")), Seq(col("w1"))),
          col("bg"), col("w1"))
        .agg(sum(col("c")).as("cnt"), grouping_id().as("gid"))
      // gid: bit per grouping col, 1 = aggregated-away. sets: (bg) →
      // w1 aggregated → gid=1; (w1) → bg aggregated → gid=2
      val model = g.agg(
          sort_array(collect_list(when(col("gid") === 1,
            struct(col("bg"), col("cnt").as("c2"))))).as("c2arr"),
          sort_array(collect_list(when(col("gid") === 2,
            struct(col("w1"), col("cnt").as("c1"))))).as("c1arr"))
        .crossJoin(pc.select(explode(col("tc")).as("t"))
          .agg(countDistinct(col("t.term")).as("vs")))
        .select(struct(col("c2arr"), col("c1arr"), col("vs")).as("model"))
      pc.crossJoin(broadcast(model))
        .select(col("doc_id"),
          call_function("graft_perplexity", col("bc"), col("model")).as("s"))
        .select(col("doc_id"),
          coalesce(col("s.n_bigrams"), lit(0L)).as("n_bigrams"),
          col("s.avg_nll").as("avg_nll"))
    }
    def prod(): DataFrame =
      graft.SparkEntry.queries("text_perplexity")(spark, dir)

    def time(f: => DataFrame): Double = {
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    time(prod()); time(gsets())
    (1 to reps).foreach { r =>
      val a = time(prod())
      val b = time(gsets())
      println(f"""{"rep":$r,"prod":$a%.2f,"gsets":$b%.2f}""")
    }
    // equality
    val d1 = prod().orderBy("doc_id")
    val d2 = gsets().orderBy("doc_id")
    val diff = d1.exceptAll(d2).count() + d2.exceptAll(d1).count()
    println(s"""{"equal":${diff == 0L}}""")
    spark.stop()
  }
}
