package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A/B: count-pass materialization (localCheckpoint) vs lazy recompute
  * for the tfidf/dsir count+model pipelines, alternating in one
  * session. Fewer barriers vs no double tokenize — which wins at 30×?
  */
object ProfileTextVariants {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("GRAFT_AB_DIR", "/tmp/graft-scale/x30")
    val reps = sys.env.getOrElse("GRAFT_AB_REPS", "5").toInt
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val docs = graft.Tables.documents(spark, dir)
    val toks = graft.functions.Text.tokens(col("text"))

    def tfidfLazy(): DataFrame = {
      val pc = docs.select(col("doc_id"),
        call_function("graft_term_counts", toks).as("tc"))
      val df = pc.select(explode(col("tc")).as("e"))
        .filter(length(col("e.term")) >= 1)
        .select(col("e.term").as("term"))
        .groupBy(col("term")).agg(count(lit(1)).as("df"))
      val model = df
        .agg(sort_array(collect_list(struct(col("term"), col("df")))).as("dfarr"))
        .crossJoin(pc.agg(count(lit(1)).as("n_docs")))
        .select(struct(col("dfarr"), col("n_docs")).as("model"))
      pc.crossJoin(broadcast(model))
        .select(col("doc_id"), explode(call_function("graft_tfidf_topk",
          col("tc"), col("model"), lit(3))).as("r"))
    }
    def dsirLazy(): DataFrame = {
      val pc = docs.select(col("doc_id").as("_id"),
        (col("lang") === "en").as("_tgt"),
        call_function("graft_dsir_buckets",
          graft.functions.Text.tokens(coalesce(col("text"), lit("")))).as("_bc"))
      val counts = pc.select(col("_tgt"), explode(col("_bc")).as("e"))
        .groupBy(col("e.bucket").as("_bucket")).agg(
          sum(col("e.c")).as("_cr"),
          sum(when(col("_tgt"), col("e.c")).otherwise(0L)).as("_ct"))
        .collect()
      val nr = counts.map(_.getLong(1)).sum
      val nt = counts.map(_.getLong(2)).sum
      val lrArr: Seq[(String, Long)] = counts.toSeq.map { r =>
        val v = 1e6 * (math.log((r.getLong(2) + 1.0) / (nt + 256.0)) -
          math.log((r.getLong(1) + 1.0) / (nr + 256.0)))
        (r.getString(0), java.math.BigDecimal.valueOf(v)
          .setScale(0, java.math.RoundingMode.HALF_UP).longValue())
      }.sortBy(_._1)
      val scored = pc.select(col("_id"),
        call_function("graft_dsir_score", col("_bc"), typedlit(lrArr))
          .as("_score_micro"))
      val thr = scored.agg(expr("percentile(_score_micro, 0.8)").as("_thr"))
      scored.crossJoin(broadcast(thr))
        .select(col("_id"), round(col("_score_micro") / lit(1e6), 6).as("score"),
          when(col("_score_micro") >= col("_thr"), 1).otherwise(0).as("selected"))
    }

    def time(f: => DataFrame): Double = {
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    time(graft.SparkEntry.queries("text_tfidf")(spark, dir)) // warm
    time(tfidfLazy())
    time(graft.SparkEntry.queries("select_dsir")(spark, dir))
    time(dsirLazy())
    (1 to reps).foreach { r =>
      val a1 = time(graft.SparkEntry.queries("text_tfidf")(spark, dir))
      val b1 = time(tfidfLazy())
      val a2 = time(graft.SparkEntry.queries("select_dsir")(spark, dir))
      val b2 = time(dsirLazy())
      println(f"""{"rep":$r,"tfidf_ckpt":$a1%.2f,"tfidf_lazy":$b1%.2f,"dsir_ckpt":$a2%.2f,"dsir_lazy":$b2%.2f}""")
    }
    spark.stop()
  }
}
