package graft.tools

/** Print the multi-LSH pre-flight estimate at scaled corpora by
  * tripping the fail-fast guard (no production code touched).
  */
object EstSlsh {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.conf.set("spark.graft.slsh.maxVerifyPairs", "1")
    spark.conf.set("spark.graft.slsh.failCapChunks", "1")
    sys.env.getOrElse("GRAFT_EST_DIRS",
      "/tmp/graft-scale/x10,/tmp/graft-scale/x30").split(",").foreach { dir =>
      try graft.SparkEntry.queries("dedup_embedding_lsh_multi")(spark, dir)
      catch {
        case e: IllegalArgumentException =>
          println(s"""{"dir":"$dir","msg":"${e.getMessage.take(120)}"}""")
      }
    }
    spark.stop()
  }
}
