package graft.tools

import org.apache.spark.sql.{DataFrame, GraftSortHack}

/** Batch A/B of the sort-sampling rule (r16): for every named query
  * whose plan ends in a global Sort, time production against
  * `unsorted-child.localCheckpoint() → same sort`. Range partitioning
  * samples its child, so the contract sort re-executes the child
  * stage; the checkpoint wins when the child kernel outweighs the
  * output bytes, loses when the output is big and the kernel cheap —
  * this tool measures WHICH, per query, instead of guessing.
  *
  * GRAFT_SORT_QUERIES: comma list of SparkEntry.queries names.
  */
object ProfileSortFamily {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("GRAFT_AB_DIR", "/tmp/graft-scale/x30")
    val reps = sys.env.getOrElse("GRAFT_AB_REPS", "5").toInt
    val names = sys.env.getOrElse("GRAFT_SORT_QUERIES",
      "text_stats,text_langid,text_fingerprint,text_clean," +
        "text_quality,text_repetition,text_tfidf,text_bm25")
      .split(",").map(_.trim).filter(_.nonEmpty)
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)

    def time(f: => DataFrame): Double = {
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    names.foreach { name =>
      val q = graft.SparkEntry.queries(name)
      def prod(): DataFrame = q(spark, dir)
      GraftSortHack.splitTopSort(prod()) match {
        case None =>
          println(s"""{"q":"$name","skip":"no top-level global sort"}""")
        case Some((_, _)) =>
          def ckpt(): DataFrame = {
            val (child, resort) = GraftSortHack.splitTopSort(prod()).get
            resort(child.localCheckpoint())
          }
          time(prod()); time(ckpt())
          val ps = (1 to reps).map(_ => time(prod())).sorted
          val cs = (1 to reps).map(_ => time(ckpt())).sorted
          val pm = ps(reps / 2); val cm = cs(reps / 2)
          val d1 = prod(); val d2 = ckpt()
          val eq = d1.exceptAll(d2).count() + d2.exceptAll(d1).count() == 0
          println(f"""{"q":"$name","prod_med":$pm%.2f,"ckpt_med":$cm%.2f,"win":${cm < pm},"equal":$eq}""")
      }
    }
    spark.stop()
  }
}
