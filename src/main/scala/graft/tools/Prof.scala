package graft.tools

import org.apache.spark.sql.functions._

import graft._
import graft.functions.Text

/** Scratch profiling main (dev tool). */
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    val dir = "/root/testdata/sf0.1"
    spark.read.parquet(s"$dir/lineitem.parquet").count() // warm
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(s"PROF $label: ${(System.nanoTime() - t0) / 1e9}")
      r
    }
    val docs = Tables.documents(spark, dir)
    time("docs count") { docs.count() }
    val sh = docs.select(col("doc_id"), col("source"),
      array_distinct(Text.shingles(Text.tokens(col("text")), 3)).as("shingle_set"))
    time("shingle compute") { sh.select(sum(size(col("shingle_set")))).head() }
    time("shingle compute 2nd") { sh.select(sum(size(col("shingle_set")))).head() }
    val inv = sh.select(col("source"), col("doc_id"),
      size(col("shingle_set")).as("_sz"),
      explode(col("shingle_set")).as("_shingle"))
    time("posting count") { println("postings: " + inv.count()) }
    val cached = inv.cache()
    time("cache materialize") { cached.count() }
    val a = cached.select(col("source"), col("_shingle"),
      col("doc_id").as("id_a"), col("_sz").as("_sza"))
    val b = cached.select(col("source"), col("_shingle"),
      col("doc_id").as("id_b"), col("_sz").as("_szb"))
    val joined = a.join(b, Seq("source", "_shingle"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"), col("_sza"), col("_szb"))
      .agg(count(lit(1)).as("_inter"))
    time("join+agg") { println("pairs: " + joined.count()) }
    time("full query") {
      graft.queries.TextQueries.dedupNgramJaccard(spark, dir).count()
    }
    spark.stop()
  }
}
