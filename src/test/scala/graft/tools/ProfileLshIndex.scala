package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.Dedup

/** Split `dedup_lsh_index`'s cost into its lifecycle phases (round-9
  * verdict #5): the once-per-corpus-version index BUILD (sign corpus →
  * versioned parquet write) vs the per-batch PROBE (sign batch → join
  * persisted postings → candidate-bounded verify). The bench query
  * pays build+probe; the DuckDB oracle replays only the derivation —
  * the build/probe split is the documented floor that tells a future
  * bench red apart from a plan regression. Prints one JSON line.
  */
object ProfileLshIndex {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.prepare(spark)

    val docs = graft.Tables.documents(spark, sf)
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    val batch = docs.filter(col("doc_id") % 5 === 0)

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    // JVM/codegen warmup on the full path with a distinct cache key
    Dedup.lshIndexProbe(
      Dedup.persistedLshIndex(spark, s"$sf#warm#${System.nanoTime}", corpus, "doc_id", "text"),
      corpus, batch, "doc_id", "text").count()

    val runs = (1 to 3).map { i =>
      val (idx, buildSec) = time {
        // nanoTime salt: the index now persists ACROSS processes, and this
        // tool exists to measure the BUILD — a reused key would time a
        // re-attach instead
        val d = Dedup.persistedLshIndex(spark, s"$sf#$i#${System.nanoTime}", corpus,
          "doc_id", "text")
        d.count() // force the versioned read side too
        d
      }
      val (n, probeSec) = time {
        Dedup.lshIndexProbe(idx, corpus, batch, "doc_id", "text")
          .orderBy("doc_id").collect().length
      }
      (buildSec, probeSec, n)
    }
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.length / 2)
    println(s"""{"query":"dedup_lsh_index","sf":"$sf",""" +
      s""""rows":${runs.head._3},""" +
      s""""build_sec_med":${f"${med(runs.map(_._1))}%.2f"},""" +
      s""""probe_sec_med":${f"${med(runs.map(_._2))}%.2f"},""" +
      s""""runs":[${runs.map(r =>
        s"""{"build":${f"${r._1}%.2f"},"probe":${f"${r._2}%.2f"}}""")
        .mkString(",")}]}""")
    spark.stop()
  }
}
