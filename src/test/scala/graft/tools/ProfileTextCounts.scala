package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stage split of the tfidf/dsir residue (r15 verdict #3): time the
  * scan, the tokenize, the count-array kernels, and the full queries
  * on one scaled corpus in one session — where does the constant live?
  * Env: GRAFT_AB_DIR (default /tmp/graft-scale/x30), GRAFT_AB_REPS (3).
  */
object ProfileTextCounts {
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
    // warmup
    docs.select(col("doc_id")).write.format("noop").mode("overwrite").save()
    time("scan_text", docs.select(col("doc_id"), col("text")))
    time("tokenize", docs.select(col("doc_id"), toks.as("t")))
    time("term_counts", docs.select(col("doc_id"),
      call_function("graft_term_counts", toks).as("tc")))
    time("term_counts_ckpt", docs.select(col("doc_id"),
      call_function("graft_term_counts", toks).as("tc")).localCheckpoint(true))
    time("dsir_buckets", docs.select(col("doc_id"),
      call_function("graft_dsir_buckets", toks).as("bc")))
    time("tfidf_full", graft.SparkEntry.queries("text_tfidf")(spark, dir))
    time("dsir_full", graft.SparkEntry.queries("select_dsir")(spark, dir))
    time("bm25_full", graft.SparkEntry.queries("text_bm25")(spark, dir))
    spark.stop()
  }
}
