package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Text

/** A/B for the hovering scoring rows (tfidf ~2.0-2.3×, dsir ~2.1× at
  * 30×):
  *  - tfidf/bm25 "sentinel": the corpus scalars (n_docs, Σdl) ride the
  *    df exchange as one per-doc sentinel entry appended to the term
  *    array — the separate corpusAgg pass (a full tokenize for bm25)
  *    and its crossJoin barrier disappear.
  *  - dsir "ckpt": localCheckpoint the doc-grain (id, score_micro)
  *    table — 16 bytes/doc — so the percentile pass and the final
  *    select stop re-evaluating the tokenize+md5 kernel (3 kernel
  *    passes → 2, the floor: model then score).
  */
object ProfileScoringFuse {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("GRAFT_AB_DIR", "/tmp/graft-scale/x30")
    val reps = sys.env.getOrElse("GRAFT_AB_REPS", "6").toInt
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val docs = graft.Tables.documents(spark, dir)

    def tfidfSentinel(k: Int): DataFrame = {
      val toks = Text.tokens(col("text"))
      val pc = docs.select(col("doc_id"),
        call_function("graft_term_counts", toks).as("tc"))
      val ex = pc.select(explode(concat(col("tc"),
          array(struct(lit(null).cast("string").as("term"),
            lit(0L).as("tf"))))).as("e"))
        .filter(col("e.term").isNull || length(col("e.term")) >= 1)
        .select(col("e.term").as("term"))
      val g = ex.groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      val model = g.agg(
          sort_array(collect_list(when(col("term").isNotNull,
            struct(col("term"), col("cnt").as("df"))))).as("dfarr"),
          max(when(col("term").isNull, col("cnt"))).as("n_docs"))
        .select(struct(col("dfarr"), col("n_docs")).as("model"))
      pc.crossJoin(broadcast(model))
        .select(col("doc_id"), explode(call_function("graft_tfidf_topk",
          col("tc"), col("model"), lit(k))).as("r"))
        .select(col("doc_id"), col("r.rank").as("rank"),
          col("r.term").as("term"), col("r.tfidf").as("tfidf"))
    }

    def bm25Sentinel(k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
      val toks = Text.tokens(col("text"))
      val pc = docs.select(col("doc_id"),
        call_function("graft_term_counts", toks).as("tc"),
        size(toks).cast("long").as("dl"))
      val ex = pc.select(explode(concat(col("tc"),
          array(struct(lit(null).cast("string").as("term"),
            col("dl").as("tf"))))).as("e"))
        .filter(col("e.term").isNull || length(col("e.term")) >= 1)
        .select(col("e.term").as("term"), col("e.tf").as("tf"))
      val g = ex.groupBy(col("term"))
        .agg(count(lit(1)).as("cnt"), sum(col("tf")).as("stf"))
      val model = g.agg(
          sort_array(collect_list(when(col("term").isNotNull,
            struct(col("term"), col("cnt").as("df"))))).as("dfarr"),
          max(when(col("term").isNull, col("cnt"))).as("n_docs"),
          (max(when(col("term").isNull, col("stf"))).cast("double") /
            max(when(col("term").isNull, col("cnt")))).as("avgdl"))
        .select(struct(col("dfarr"), col("n_docs"), col("avgdl")).as("model"))
      pc.crossJoin(broadcast(model))
        .select(col("doc_id"), explode(call_function("graft_bm25_topk",
          col("tc"), col("dl"), col("model"), lit(k), lit(k1), lit(b)))
          .as("r"))
        .select(col("doc_id"), col("r.rank").as("rank"),
          col("r.term").as("term"), col("r.bm25").as("bm25"))
    }

    def dsirCkpt(quantile: Double): DataFrame = {
      val isTarget = col("source") === "src0"
      val pc = docs.select(col("doc_id").as("_id"), isTarget.as("_tgt"),
        call_function("graft_dsir_buckets",
          Text.tokens(coalesce(col("text"), lit("")))).as("_bc"))
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
      val scored = pc
        .select(col("_id"),
          call_function("graft_dsir_score", col("_bc"), typedlit(lrArr))
            .as("_score_micro"))
        .localCheckpoint()
      val thr = scored.agg(
        expr(s"percentile(_score_micro, $quantile)").as("_thr"))
      scored.crossJoin(broadcast(thr))
        .select(col("_id").as("doc_id"),
          round(col("_score_micro") / lit(1e6), 6).as("score"),
          when(col("_score_micro") >= col("_thr"), 1).otherwise(0)
            .as("selected"))
    }

    def tfidfProd(k: Int): DataFrame =
      graft.ext.TfIdf.topTerms(docs, "doc_id", "text", k)
    def bm25Prod(k: Int): DataFrame =
      graft.ext.TfIdf.bm25TopTerms(docs, "doc_id", "text", k)
    def dsirProd(q: Double): DataFrame = graft.ext.Dsir.scoreAndSelect(
      docs, "doc_id", "text", col("source") === "src0", q)

    def time(f: => DataFrame): Double = {
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    time(tfidfProd(5)); time(tfidfSentinel(5)); time(bm25Prod(5))
    time(bm25Sentinel(5)); time(dsirProd(0.8)); time(dsirCkpt(0.8))
    (1 to reps).foreach { r =>
      val a = time(tfidfProd(5)); val b = time(tfidfSentinel(5))
      val c = time(bm25Prod(5)); val d = time(bm25Sentinel(5))
      val e = time(dsirProd(0.8)); val f = time(dsirCkpt(0.8))
      println(f"""{"rep":$r,"tfidf_prod":$a%.2f,"tfidf_sent":$b%.2f,"bm25_prod":$c%.2f,"bm25_sent":$d%.2f,"dsir_prod":$e%.2f,"dsir_ckpt":$f%.2f}""")
    }
    val eq = tfidfProd(5).exceptAll(tfidfSentinel(5)).count() +
      tfidfSentinel(5).exceptAll(tfidfProd(5)).count() +
      bm25Prod(5).exceptAll(bm25Sentinel(5)).count() +
      bm25Sentinel(5).exceptAll(bm25Prod(5)).count() +
      dsirProd(0.8).exceptAll(dsirCkpt(0.8)).count() +
      dsirCkpt(0.8).exceptAll(dsirProd(0.8)).count()
    println(s"""{"equal":${eq == 0L}}""")
    spark.stop()
  }
}
