package graft.tools

import graft._

/** Scratch profiling main (dev tool). */
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val fast = graft.queries.TextQueries.dedupMinhashFast(spark, dir)
      val md5v = graft.queries.TextQueries.dedupMinhashLsh(spark, dir)
      println(s"PROF $dir fast jaccards: " +
        fast.select("jaccard").collect().map(_.getDouble(0)).sorted.mkString(","))
      println(s"PROF $dir md5 jaccards:  " +
        md5v.select("jaccard").collect().map(_.getDouble(0)).sorted.mkString(","))
      val f5 = fast.filter("jaccard >= 0.5").select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val m5 = md5v.filter("jaccard >= 0.5").select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      println(s"PROF $dir thresholded equal: ${f5 == m5} (fast ${f5.size}, md5 ${m5.size})")
    }
    spark.stop()
  }
}
