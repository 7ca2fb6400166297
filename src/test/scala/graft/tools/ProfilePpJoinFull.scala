package graft.tools

/** End-to-end reps of the production PPJoin query in a fresh session —
  * the stability check for the r19 verify-kernel change (the phase
  * tool's `full` reps share a session with five other phases' lingering
  * localCheckpoint blocks, which can smear its numbers).
  */
object ProfilePpJoinFull {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = sys.env.getOrElse("GRAFT_AB_RUNS", "4").toInt
    val spark = Harness.session()
    val docs = graft.Tables.documents(spark, sfDir)
    val ts = (1 to runs).map { _ =>
      Harness.time(graft.ext.PpJoin.pairs(docs, "doc_id", "text", 3, 0.5)
        .write.format("noop").mode("overwrite").save())
    }
    def med(a: Seq[Double]) = a.sorted.apply((a.length - 1) / 2)
    println(f"""{"sf":"$sfDir","full_med":${med(ts)}%.2f,"full":[${ts.map(x => f"$x%.2f").mkString(",")}]}""")
    spark.stop()
  }
}
