package graft.tools

import org.apache.spark.sql.functions._

/** Stage timing of record_linkage at sf0.1: candidate generation vs
  * levenshtein scoring vs the packed argmin.
  */
object ProfileLinkage {
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
    val parts = graft.Tables.part(spark, sf)
      .select("p_partkey", "p_name", "p_brand", "p_size")
    time("warmup")(parts.count())
    println("parts rows: " + parts.count())
    for (round <- 1 to 2) {
      println(s"--- round $round")
      val dirty = parts.select(col("p_partkey").as("d_id"),
        expr("replace(p_name, 'a', '')").as("d_name"),
        col("p_brand").as("d_brand"), col("p_size").as("d_size"))
      val cand = dirty.join(parts, col("d_brand") === col("p_brand") &&
        expr("d_size div 8") === expr("p_size div 8"))
      time("candidates only")(noop(cand))
      println("candidate rows: " + cand.count())
      time("cand + levenshtein")(noop(cand.withColumn("lev",
        levenshtein(col("d_name"), col("p_name"), 8).cast("long"))))
      time("full record_linkage")(noop(
        graft.queries.RelationalQueries.recordLinkage(spark, sf)))
    }
    spark.stop()
  }
}
