package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Phase split of the CURRENT text_perplexity shape (r18): where do
  * the seconds go between the tokenize/bigram checkpoint, the model
  * fold (explode → vocab-grain exchange → one-row collect+sort), the
  * solo supplement, and the scoring+sort pass? Phases are timed off a
  * shared prebuilt checkpoint so each number is ONE phase's cost.
  */
object ProfilePerplexPhases {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("GRAFT_AB_DIR", "/tmp/graft-scale/x30")
    val reps = sys.env.getOrElse("GRAFT_AB_REPS", "5").toInt
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val docs = graft.Tables.documents(spark, dir)
    val toks = graft.functions.Text.tokens(col("text"))

    def pcFresh(): DataFrame = docs.select(col("doc_id"),
        call_function("graft_bigram_counts", toks).as("bc"),
        when(size(toks) === 1, element_at(toks, 1)).as("solo"))
      .localCheckpoint()

    def modelOf(pc: DataFrame): DataFrame = pc
      .select(explode(col("bc")).as("e"))
      .groupBy(col("e.bg").as("bg")).agg(sum(col("e.c")).as("cnt"))
      .agg(sort_array(collect_list(struct(col("bg"),
        col("cnt").as("c2")))).as("c2arr"))
      .crossJoin(pc.agg(collect_set(col("solo")).as("sup")))
      .select(call_function("graft_perplexity_model",
        col("c2arr"), col("sup")).as("model"))

    // candidate: the global bigram table as ONE imperative aggregate
    // (graft_bigram_table) with the solo set riding the same exchange —
    // deletes the vocab-grain groupBy, the one-task collect+sort, and
    // the crossJoin barrier
    def modelTiaOf(pc: DataFrame): DataFrame = pc
      .agg(call_function("graft_bigram_table", col("bc")).as("c2arr"),
        collect_set(col("solo")).as("sup"))
      .select(call_function("graft_perplexity_model",
        col("c2arr"), col("sup")).as("model"))

    def scoreOf(pc: DataFrame, model: DataFrame): DataFrame =
      pc.crossJoin(broadcast(model))
        .select(col("doc_id"),
          call_function("graft_perplexity", col("bc"), col("model")).as("s"))
        .select(col("doc_id"),
          coalesce(col("s.n_bigrams"), lit(0L)).as("n_bigrams"),
          col("s.avg_nll").as("avg_nll"))
        .localCheckpoint()
        .orderBy("doc_id")

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def prod(): DataFrame =
      graft.SparkEntry.queries("text_perplexity")(spark, dir)

    // warm
    noop(prod())
    val pcShared = pcFresh()
    noop(modelOf(pcShared))
    def kernelOnly(pc: DataFrame, model: DataFrame): DataFrame =
      pc.crossJoin(broadcast(model))
        .select(col("doc_id"),
          call_function("graft_perplexity", col("bc"), col("model")).as("s"))
        .select(col("doc_id"),
          coalesce(col("s.n_bigrams"), lit(0L)).as("n_bigrams"),
          col("s.avg_nll").as("avg_nll"))

    (1 to reps).foreach { r =>
      val tProd = time(noop(prod()))
      val tCkpt = time { val p = pcFresh(); p.unpersist(true) }
      val tModel = time(noop(modelOf(pcShared)))
      val mShared = modelOf(pcShared).localCheckpoint()
      val tScore = time(noop(scoreOf(pcShared, mShared)))
      val tKernel = time(noop(kernelOnly(pcShared, mShared)))
      val tModelTia = time(noop(modelTiaOf(pcShared)))
      println(f"""{"rep":$r,"prod":$tProd%.2f,"ckpt":$tCkpt%.2f,""" +
        f""""model":$tModel%.2f,"score":$tScore%.2f,""" +
        f""""kernel":$tKernel%.2f,"modelTia":$tModelTia%.2f}""")
    }
    val eq = modelTiaOf(pcShared).exceptAll(modelOf(pcShared)).count() +
      modelOf(pcShared).exceptAll(modelTiaOf(pcShared)).count()
    println(s"""{"model_equal":${eq == 0L}}""")
    spark.stop()
  }
}
