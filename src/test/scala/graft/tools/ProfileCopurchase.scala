package graft.tools

/** Same-session A/B of the array-side co-purchase pair generation vs
  * the distinct + self-join form, alternating runs with medians, on
  * any dir (base sf or a ScaleCurve x{m} replica) — the host's drift
  * phases are wider than the plan delta at this absolute scale, so
  * only alternation in one session is a trustworthy comparison.
  */
object ProfileCopurchase {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = sys.env.getOrElse("GRAFT_AB_RUNS", "5").toInt
    val spark = Harness.session()

    def run(f: => org.apache.spark.sql.DataFrame): Double =
      Harness.time(f.write.format("noop").mode("overwrite").save())

    run(graft.queries.AnalyticsQueries.copurchasePairs(spark, dir))
    run(graft.queries.AnalyticsQueries.copurchasePairsJoined(spark, dir))
    val arr = Array.fill(runs)(0.0)
    val joined = Array.fill(runs)(0.0)
    (0 until runs).foreach { r =>
      arr(r) = run(graft.queries.AnalyticsQueries.copurchasePairs(spark, dir))
      joined(r) = run(graft.queries.AnalyticsQueries.copurchasePairsJoined(spark, dir))
    }
    def med(a: Array[Double]) = a.sorted.apply((a.length - 1) / 2)
    println(f"""{"dir":"$dir","array_med":${med(arr)}%.2f,"joined_med":${med(joined)}%.2f,"array":[${arr.map(x => f"$x%.2f").mkString(",")}],"joined":[${joined.map(x => f"$x%.2f").mkString(",")}]}""")
    spark.stop()
  }
}
