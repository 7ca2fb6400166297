package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stage split for text_perplexity's remaining constant (r16): time
  * the three sequential phases of the production shape separately —
  * the checkpointed count pass (kernel + materialization), the model
  * job (explode → bg exchange → one-row fold), and the scoring pass
  * (broadcast + map-side score + the contract's orderBy) — to show
  * which part of the >2× residue is reducible.
  */
object ProfilePerplexSplit {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("GRAFT_AB_DIR", "/tmp/graft-scale/x30")
    val reps = sys.env.getOrElse("GRAFT_AB_REPS", "5").toInt
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val docs = graft.Tables.documents(spark, dir)
    val toks = graft.functions.Text.tokens(col("text"))

    def run(): (Double, Double, Double) = {
      val t0 = System.nanoTime()
      val pc = docs.select(col("doc_id"),
          call_function("graft_bigram_counts", toks).as("bc"),
          when(size(toks) === 1, element_at(toks, 1)).as("solo"))
        .localCheckpoint() // eager: materializes here
      val t1 = System.nanoTime()
      val c2t = pc.select(explode(col("bc")).as("e"))
        .groupBy(col("e.bg").as("bg")).agg(sum(col("e.c")).as("cnt"))
      val model = c2t
        .agg(sort_array(collect_list(struct(col("bg"),
          col("cnt").as("c2")))).as("c2arr"))
        .crossJoin(pc.agg(collect_set(col("solo")).as("sup")))
        .select(call_function("graft_perplexity_model",
          col("c2arr"), col("sup")).as("model"))
      val modelRows = model.collect() // the broadcast build, timed alone
      val t2 = System.nanoTime()
      val m = modelRows.head
      val bm = org.apache.spark.sql.functions.typedlit(0) // placeholder
      // re-broadcast the collected model via a 1-row frame so the
      // scoring phase times ONLY broadcast + score + sort
      val mdf = spark.createDataFrame(
        java.util.List.of(m), m.schema)
      pc.crossJoin(broadcast(mdf))
        .select(col("doc_id"),
          call_function("graft_perplexity", col("bc"), col("model")).as("s"))
        .select(col("doc_id"),
          coalesce(col("s.n_bigrams"), lit(0L)).as("n_bigrams"),
          col("s.avg_nll").as("avg_nll"))
        .orderBy("doc_id")
        .write.format("noop").mode("overwrite").save()
      val t3 = System.nanoTime()
      ((t1 - t0) / 1e9, (t2 - t1) / 1e9, (t3 - t2) / 1e9)
    }
    // sub-split of the scoring phase: sort vs kernel vs ckpt-read
    def subSplit(): (Double, Double, Double, Double) = {
      val pc = docs.select(col("doc_id"),
          call_function("graft_bigram_counts", toks).as("bc"),
          when(size(toks) === 1, element_at(toks, 1)).as("solo"))
        .localCheckpoint()
      val c2t = pc.select(explode(col("bc")).as("e"))
        .groupBy(col("e.bg").as("bg")).agg(sum(col("e.c")).as("cnt"))
      val model = c2t
        .agg(sort_array(collect_list(struct(col("bg"),
          col("cnt").as("c2")))).as("c2arr"))
        .crossJoin(pc.agg(collect_set(col("solo")).as("sup")))
        .select(call_function("graft_perplexity_model",
          col("c2arr"), col("sup")).as("model"))
      val m = model.collect().head
      val mdf = spark.createDataFrame(java.util.List.of(m), m.schema)
      def scored = pc.crossJoin(broadcast(mdf))
        .select(col("doc_id"),
          call_function("graft_perplexity", col("bc"), col("model")).as("s"))
        .select(col("doc_id"),
          coalesce(col("s.n_bigrams"), lit(0L)).as("n_bigrams"),
          col("s.avg_nll").as("avg_nll"))
      def t(f: => DataFrame): Double = {
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val full = t(scored.orderBy("doc_id"))
      val nosort = t(scored)
      // global sort = range partitioning = a SAMPLING job over the
      // child, which re-executes the scoring kernel; materializing the
      // 20-byte/doc scored rows first makes the sample pass read
      // cheap fixed-width rows instead
      val ckptSort = t(scored.localCheckpoint().orderBy("doc_id"))
      val readOnly = t(pc.select(col("doc_id"), size(col("bc")).as("n")))
      (full, nosort, ckptSort, readOnly)
    }
    run(); subSplit()
    (1 to reps).foreach { r =>
      val (a, b, c) = run()
      val (f2, ns, cs, ro) = subSplit()
      println(f"""{"rep":$r,"ckpt":$a%.2f,"model":$b%.2f,"score":$c%.2f,"total":${a + b + c}%.2f,"score_full":$f2%.2f,"score_nosort":$ns%.2f,"score_ckpt_sort":$cs%.2f,"ckpt_read":$ro%.2f}""")
    }
    spark.stop()
  }
}
