package graft.tools

import org.apache.spark.sql.functions._

/** Stage timing of the repeated-span dedup at sf0.1: how much of the
  * ~2 s is the k-gram explode vs the count/join/sweep stages?
  */
object ProfileSpans {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32)
    val sf = "/root/testdata/sf0.1"
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val docs = graft.Tables.documents(spark, sf)
    time("warmup")(docs.count())
    val k = 8
    for (round <- 1 to 2) {
      println(s"--- round $round")
      val toks = docs.select(col("doc_id").as("d"),
        graft.functions.Text.tokens(coalesce(col("text"), lit(""))).as("toks"))
      time("tokens only")(noop(toks))
      val kg = toks.select(col("d"),
        posexplode(when(size(col("toks")) >= k,
          transform(sequence(lit(0), size(col("toks")) - k),
            i => xxhash64(concat_ws(" ", slice(col("toks"), i + 1, lit(k))))))
          .otherwise(array().cast("array<bigint>"))).as(Seq("pos", "h")))
      time("kgram explode")(noop(kg))
      time("kgram + count>=2")(noop(
        kg.groupBy(col("h")).agg(count(lit(1)).as("n"))
          .filter(col("n") >= 2).select("h")))
      time("full dedup_substring")(noop(
        graft.queries.TextQueries.dedupSubstring(spark, sf)))
    }
    spark.stop()
  }
}
