package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A/B for the perplexity model build, all sharing the checkpointed
  * count pass and graft_prefix_c1-derived context table:
  *  - gsets:    r15 production (GROUPING SETS (bg),(w1) + separate
  *              vocab leg) — the baseline
  *  - noexpand: groupBy(bg) only (c1 derived in the fold), vocab stays
  *              a separate concurrent leg
  *  - union:    one kind-tagged exchange via unionAll of the two
  *              explodes (c1 derived, vocab folded, no per-row array
  *              copies — unlike the losing transform+concat form)
  */
object ProfilePerplexFuse {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("GRAFT_AB_DIR", "/tmp/graft-scale/x30")
    val reps = sys.env.getOrElse("GRAFT_AB_REPS", "5").toInt
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val docs = graft.Tables.documents(spark, dir)
    val toks = graft.functions.Text.tokens(col("text"))

    def pcF(): DataFrame = docs.select(col("doc_id"),
        call_function("graft_bigram_counts", toks).as("bc"),
        call_function("graft_term_counts", toks).as("tc"))
      .localCheckpoint()

    def score(pc: DataFrame, model: DataFrame): DataFrame =
      pc.crossJoin(broadcast(model))
        .select(col("doc_id"),
          call_function("graft_perplexity", col("bc"), col("model")).as("s"))
        .select(col("doc_id"),
          coalesce(col("s.n_bigrams"), lit(0L)).as("n_bigrams"),
          col("s.avg_nll").as("avg_nll"))

    def gsets(): DataFrame = {
      val pc = pcF()
      val ex = pc.select(explode(col("bc")).as("e"))
        .select(col("e.bg").as("bg"), col("e.w1").as("w1"), col("e.c").as("c"))
      val g = ex.groupingSets(Seq(Seq(col("bg")), Seq(col("w1"))),
          col("bg"), col("w1"))
        .agg(sum(col("c")).as("cnt"), grouping_id().as("gid"))
      val model = g.agg(
          sort_array(collect_list(when(col("gid") === 1,
            struct(col("bg"), col("cnt").as("c2"))))).as("c2arr"),
          sort_array(collect_list(when(col("gid") === 2,
            struct(col("w1"), col("cnt").as("c1"))))).as("c1arr"))
        .crossJoin(pc.select(explode(col("tc")).as("t"))
          .agg(countDistinct(col("t.term")).as("vs")))
        .select(struct(col("c2arr"), col("c1arr"), col("vs")).as("model"))
      score(pc, model)
    }

    def noexpand(): DataFrame = {
      val pc = pcF()
      val c2t = pc.select(explode(col("bc")).as("e"))
        .groupBy(col("e.bg").as("bg")).agg(sum(col("e.c")).as("cnt"))
      val v = pc.select(explode(col("tc")).as("t"))
        .agg(countDistinct(col("t.term")).as("vs"))
      val model = c2t
        .agg(sort_array(collect_list(struct(col("bg"),
          col("cnt").as("c2")))).as("c2arr"))
        .crossJoin(v)
        .select(struct(col("c2arr"),
          call_function("graft_prefix_c1", col("c2arr")).as("c1arr"),
          col("vs")).as("model"))
      score(pc, model)
    }

    def union(): DataFrame = {
      val pc = pcF()
      val ex = pc.select(explode(col("bc")).as("e"))
        .select(lit(0).as("kind"), col("e.bg").as("k"), col("e.c").as("c"))
        .unionAll(pc.select(explode(col("tc")).as("t"))
          .select(lit(1).as("kind"), col("t.term").as("k"),
            col("t.tf").as("c")))
      val g = ex.groupBy(col("kind"), col("k")).agg(sum(col("c")).as("cnt"))
      val model = g.agg(
          sort_array(collect_list(when(col("kind") === 0,
            struct(col("k").as("bg"), col("cnt").as("c2"))))).as("c2arr"),
          count(when(col("kind") === 1, 1)).as("vs"))
        .select(struct(col("c2arr"),
          call_function("graft_prefix_c1", col("c2arr")).as("c1arr"),
          col("vs")).as("model"))
      score(pc, model)
    }

    // vocab derived inside the model expression: no term_counts
    // kernel, no tc bytes in the checkpoint, no term-grain exchange —
    // only the tiny solo-token collect_set supplements the bigrams
    def notc(ckpt: Boolean): DataFrame = {
      val pc0 = docs.select(col("doc_id"),
        call_function("graft_bigram_counts", toks).as("bc"),
        when(size(toks) === 1, element_at(toks, 1)).as("solo"))
      val pc = if (ckpt) pc0.localCheckpoint() else pc0
      val c2t = pc.select(explode(col("bc")).as("e"))
        .groupBy(col("e.bg").as("bg")).agg(sum(col("e.c")).as("cnt"))
      val model = c2t
        .agg(sort_array(collect_list(struct(col("bg"),
          col("cnt").as("c2")))).as("c2arr"))
        .crossJoin(pc.agg(collect_set(col("solo")).as("sup")))
        .select(call_function("graft_perplexity_model",
          col("c2arr"), col("sup")).as("model"))
      score(pc, model)
    }

    def time(f: => DataFrame): Double = {
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    time(gsets()); time(noexpand()); time(union())
    time(notc(true)); time(notc(false))
    (1 to reps).foreach { r =>
      val a = time(gsets())
      val b = time(noexpand())
      val c = time(union())
      val d = time(notc(true))
      val e = time(notc(false))
      println(f"""{"rep":$r,"gsets":$a%.2f,"noexpand":$b%.2f,"union":$c%.2f,"notc":$d%.2f,"notc_lazy":$e%.2f}""")
    }
    val d1 = gsets().orderBy("doc_id")
    val d2 = noexpand().orderBy("doc_id")
    val d3 = union().orderBy("doc_id")
    val d4 = notc(true).orderBy("doc_id")
    val eq = d1.exceptAll(d2).count() + d2.exceptAll(d1).count() +
      d1.exceptAll(d3).count() + d3.exceptAll(d1).count() +
      d1.exceptAll(d4).count() + d4.exceptAll(d1).count()
    println(s"""{"equal":${eq == 0L}}""")
    spark.stop()
  }
}
