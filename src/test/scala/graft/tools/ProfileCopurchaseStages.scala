package graft.tools

import org.apache.spark.sql.functions._

/** Stage split of the packed co-purchase plan on any dir: times the
  * basket build (distinct-per-order collect_set + sort_array) alone,
  * then the full query, alternating — locates the 10× constant before
  * any further reshape (basket agg vs pair count-agg).
  */
object ProfileCopurchaseStages {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = sys.env.getOrElse("GRAFT_AB_RUNS", "5").toInt
    val spark = Harness.session()

    def baskets() = graft.Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"))
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("parts"))

    def run(f: => org.apache.spark.sql.DataFrame): Double =
      Harness.time(f.write.format("noop").mode("overwrite").save())

    run(baskets())
    run(graft.queries.AnalyticsQueries.copurchasePairs(spark, dir))
    val b = Array.fill(runs)(0.0)
    val full = Array.fill(runs)(0.0)
    (0 until runs).foreach { r =>
      b(r) = run(baskets())
      full(r) = run(graft.queries.AnalyticsQueries.copurchasePairs(spark, dir))
    }
    def med(a: Array[Double]) = a.sorted.apply((a.length - 1) / 2)
    println(f"""{"dir":"$dir","baskets_med":${med(b)}%.2f,"full_med":${med(full)}%.2f,"baskets":[${b.map(x => f"$x%.2f").mkString(",")}],"full":[${full.map(x => f"$x%.2f").mkString(",")}]}""")
    spark.stop()
  }
}
