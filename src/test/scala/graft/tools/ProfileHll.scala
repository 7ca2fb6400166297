package graft.tools

import org.apache.spark.sql.functions._

/** Stage-by-stage timing of approx_distinct at sf0.1 — which stage of
  * the declarative HLL pipeline carries the 5 s the noop-sink bench
  * surfaced?
  */
object ProfileHll {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32)
    val sf = "/root/testdata/sf0.1"
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val li = graft.Tables.lineitem(spark, sf)
    time("warmup count")(li.count())
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    for (round <- 1 to 2) {
      println(s"--- round $round")
      time("scan 2 cols")(noop(li.select(col("l_partkey"), col("l_orderkey"))))
      val exploded = li.select(col("l_returnflag"),
        posexplode(array(col("l_partkey").cast("string"),
          col("l_orderkey").cast("string"))).as(Seq("_ci", "_v")))
      time("explode only")(noop(exploded))
      time("explode+md5")(noop(exploded.select(md5(col("_v")).as("h"))))
      time("registers")(noop(graft.ext.Hll.registers(exploded,
        Seq("l_returnflag", "_ci"), "_v")))
      val hex = md5(col("_v").cast("string"))
      time("md5+conv bucket")(noop(exploded.filter(col("_v").isNotNull)
        .select(col("l_returnflag"), col("_ci"),
          conv(substring(hex, 1, 2), 16, 10).cast("int").as("_b"))))
      time("md5+regex strip")(noop(exploded.filter(col("_v").isNotNull)
        .select(regexp_replace(substring(hex, 3, 10), "^0+", "").as("x"))))
      time("bucket+rho no agg")(noop(exploded.filter(col("_v").isNotNull)
        .select(col("l_returnflag"), col("_ci"),
          conv(substring(hex, 1, 2), 16, 10).cast("int").as("_b"),
          regexp_replace(substring(hex, 3, 10), "^0+", "").as("_r0"))))
      time("full approx_distinct")(noop(
        graft.queries.AnalyticsQueries.approxDistinct(spark, sf)))
    }
    spark.stop()
  }
}
