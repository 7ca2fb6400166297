package graft

import org.apache.spark.sql.functions._

/** HLL sketch accuracy: approx distinct within the configured rsd of
  * the exact answer on real data.
  */
class ApproxSpec extends SparkSpec {

  test("approx_count_distinct within 3x rsd of exact") {
    val li = Tables.lineitem(spark, sf)
    val both = li.groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey"), rsd = 0.01).as("approx"),
        countDistinct(col("l_partkey")).as("exact"))
      .collect()
    both.foreach { r =>
      val (a, e) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
      assert(math.abs(a - e) / e <= 0.03, s"approx=$a exact=$e")
    }
  }
}
