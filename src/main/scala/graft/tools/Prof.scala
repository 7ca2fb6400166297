package graft.tools

import graft._

/** Scratch profiling main (dev tool). */
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    val dir = "/root/testdata/sf0.1"
    spark.read.parquet(s"$dir/lineitem.parquet").count() // warm
    for (round <- 1 to 3) {
      val t0 = System.nanoTime()
      graft.queries.SimilarityQueries.similarityIvf(spark, dir).count()
      spark.catalog.clearCache()
      println(s"ivf round $round: ${(System.nanoTime()-t0)/1e9}")
    }
    spark.stop()
  }
}
