package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Second-level split of the tfidf/dsir residue: with the count pass
  * checkpointed ONCE up front, time each downstream stage of the
  * count+model pipeline cumulatively. Env: GRAFT_AB_DIR, GRAFT_AB_REPS.
  */
object ProfileTextModel {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("GRAFT_AB_DIR", "/tmp/graft-scale/x30")
    val reps = sys.env.getOrElse("GRAFT_AB_REPS", "3").toInt
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val docs = graft.Tables.documents(spark, dir)
    val toks = graft.functions.Text.tokens(col("text"))
    def time(label: String, f: => DataFrame): Unit = {
      val secs = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val med = secs.sorted.apply(reps / 2)
      println(f"""{"stage":"$label","med_sec":$med%.2f,"secs":[${secs.map(s => f"$s%.2f").mkString(",")}]}""")
    }
    docs.select(col("doc_id")).write.format("noop").mode("overwrite").save()

    // ---- tfidf stages over ONE checkpointed count pass
    val pc = docs.select(col("doc_id"),
      call_function("graft_term_counts", toks).as("tc")).localCheckpoint()
    val df = pc.select(explode(col("tc")).as("e"))
      .filter(length(col("e.term")) >= 1)
      .select(col("e.term").as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    time("tfidf_df_agg", df)
    val model = df
      .agg(sort_array(collect_list(struct(col("term"), col("df")))).as("dfarr"))
      .crossJoin(pc.agg(countDistinct(col("doc_id")).as("n_docs")))
      .select(struct(col("dfarr"), col("n_docs")).as("model"))
    time("tfidf_model_row", model)
    time("tfidf_score", pc.crossJoin(broadcast(model))
      .select(col("doc_id"), explode(call_function("graft_tfidf_topk",
        col("tc"), col("model"), lit(3))).as("r")))
    time("tfidf_ndocs_countDistinct",
      pc.agg(countDistinct(col("doc_id")).as("n_docs")))
    time("tfidf_ndocs_count", pc.agg(count(lit(1)).as("n_docs")))

    // ---- dsir stages over ONE checkpointed bucket pass
    val bc = docs.select(col("doc_id").as("_id"),
        (col("doc_id") % 7 === 0).as("_tgt"),
        call_function("graft_dsir_buckets",
          graft.functions.Text.tokens(coalesce(col("text"), lit("")))).as("_bc"))
      .localCheckpoint()
    val counts = bc.select(col("_tgt"), explode(col("_bc")).as("e"))
      .groupBy(col("e.bucket").as("_bucket")).agg(
        sum(col("e.c")).as("_cr"),
        sum(when(col("_tgt"), col("e.c")).otherwise(0L)).as("_ct"))
    time("dsir_counts_agg", counts)
    val totals = counts.agg(sum(col("_cr")).as("_nr"), sum(col("_ct")).as("_nt"))
    val lr = counts.crossJoin(broadcast(totals))
      .select(col("_bucket"),
        round(lit(1e6) *
          (log((col("_ct") + lit(1.0)) / (col("_nt") + lit(256.0))) -
           log((col("_cr") + lit(1.0)) / (col("_nr") + lit(256.0)))))
          .cast("long").as("_lr_micro"))
      .agg(sort_array(collect_list(struct(col("_bucket"), col("_lr_micro"))))
        .as("_lrarr"))
    time("dsir_lr_row", lr)
    val scored = bc.crossJoin(broadcast(lr))
      .select(col("_id"),
        call_function("graft_dsir_score", col("_bc"), col("_lrarr"))
          .as("_score_micro"))
    time("dsir_scored", scored)
    time("dsir_thr", scored.agg(
      expr("percentile(_score_micro, 0.8)").as("_thr")))
    val thr = scored.agg(expr("percentile(_score_micro, 0.8)").as("_thr"))
    time("dsir_final", scored.crossJoin(broadcast(thr))
      .select(col("_id"),
        round(col("_score_micro") / lit(1e6), 6).as("score"),
        when(col("_score_micro") >= col("_thr"), 1).otherwise(0)
          .as("selected")))
    spark.stop()
  }
}
