package graft.tools

import org.apache.spark.sql.functions._

/** Why does dedup_substring_keepfirst go superlinear at 10x corpus
  * while the base variant stays floor-bound? Stage split + executed
  * plan of the keepfirst pipeline on the scaled dir.
  */
object ProfileSpansKF {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32)
    val dir = sys.env.getOrElse("GRAFT_SCALE_DIR", "/tmp/graft-scale/x10")
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val docs = graft.Tables.documents(spark, dir)
    time("warmup")(docs.count())
    val k = 8
    for (round <- 1 to 2) {
      println(s"--- round $round")
      val toks = docs.select(col("doc_id").as("doc_id"),
        graft.functions.Text.tokens(coalesce(col("text"), lit(""))).as("toks"))
      val kg = toks.select(col("doc_id"),
        posexplode(when(size(col("toks")) >= k,
          transform(sequence(lit(0), size(col("toks")) - k),
            i => xxhash64(concat_ws(" ", slice(col("toks"), i + 1, lit(k))))))
          .otherwise(array().cast("array<bigint>"))).as(Seq("pos", "h")))
      time("kgram explode")(noop(kg))
      val repeated = kg.groupBy(col("h"))
        .agg(count(lit(1)).as("n")).filter(col("n") >= 2).select("h")
      val hits = kg.join(repeated, "h")
      time("hits")(noop(hits))
      val surv = hits.groupBy(col("h"))
        .agg(min(struct(col("doc_id"), col("pos"))).as("_s"))
      time("surv")(noop(surv))
      val markedOcc = hits.join(surv, "h")
        .filter(col("doc_id") =!= col("_s.doc_id") ||
          col("pos") =!= col("_s.pos"))
        .select(col("doc_id"), col("pos"), col("h"))
      time("markedOcc")(noop(markedOcc))
      val marked = markedOcc
        .groupBy(col("doc_id")).agg(sort_array(collect_set(col("pos"))).as("marks"))
      time("marked")(noop(marked))
      time("full keepfirst")(noop(
        graft.ext.Dedup.removeRepeatedSpans(docs, "doc_id", "text", 8,
          keepFirst = true).orderBy("doc_id")))
      time("full base")(noop(
        graft.ext.Dedup.removeRepeatedSpans(docs, "doc_id", "text", 8,
          keepFirst = false).orderBy("doc_id")))
    }
    if (sys.env.contains("GRAFT_EXPLAIN"))
      graft.ext.Dedup.removeRepeatedSpans(docs, "doc_id", "text", 8,
        keepFirst = true).explain("formatted")
    spark.stop()
  }
}
