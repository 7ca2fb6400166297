package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stage split + shape A/B for join_regional_revenue (r16 verdict #6:
  * ratio parked ~8-9× across two octaves against a 0.33 s twin —
  * prove fixed cadence or find the growing term).
  *
  * Split timings (noop sink):
  *  - scan:   lineitem project only (the data floor)
  *  - join:   li ⋈ orders only (adds the two key-grain exchanges)
  *  - prod:   full query
  *  - preagg: lineitem pre-aggregated to orderkey grain BEFORE the
  *    join — partial agg compresses the ~4 lineitems/order inside the
  *    map stage, so the big exchange ships |orders| rows, not
  *    |lineitem|; the small-key rollup then happens after the
  *    broadcast dims.
  */
object ProfileRegionalSplit {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("GRAFT_AB_DIR", "/tmp/graft-scale/x30")
    val reps = sys.env.getOrElse("GRAFT_AB_REPS", "6").toInt
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)

    def li: DataFrame = graft.Tables.lineitem(spark, dir)
      .select(col("l_orderkey"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
    def ord: DataFrame = graft.Tables.orders(spark, dir)
      .select("o_orderkey", "o_custkey")

    def scanOnly(): DataFrame = li

    def joinOnly(): DataFrame =
      li.join(ord, col("l_orderkey") === col("o_orderkey"))

    def prod(): DataFrame =
      graft.queries.RelationalQueries.regionalRevenue(spark, dir)

    def preagg(): DataFrame = {
      val cust = graft.Tables.customer(spark, dir)
        .select("c_custkey", "c_nationkey")
      val nat = graft.Tables.nation(spark, dir)
      val reg = graft.Tables.region(spark, dir)
      val liAgg = li.groupBy(col("l_orderkey"))
        .agg(sum(col("rev")).as("rev"), count(lit(1)).as("n"))
      liAgg.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(round(sum(col("rev")), 2).as("revenue"),
          sum(col("n")).as("n_items"))
        .orderBy("r_name", "n_name")
    }

    // r18 candidate: fold the three dimension hops into ONE broadcast
    // of (c_custkey → r_name, n_name) — the probe stage pays one hash
    // lookup per row instead of three, and nation/region broadcast
    // inside the dim-build job instead of as separate probe-side hops
    def dimfold(): DataFrame = {
      val cust = graft.Tables.customer(spark, dir)
        .select("c_custkey", "c_nationkey")
      val nat = graft.Tables.nation(spark, dir)
      val reg = graft.Tables.region(spark, dir)
      val dim = cust
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
        .select(col("c_custkey"), col("r_name"), col("n_name"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(dim), col("o_custkey") === col("c_custkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(round(sum(col("rev")), 2).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("r_name", "n_name")
    }

    def time(f: => DataFrame): Double = {
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    time(scanOnly()); time(joinOnly()); time(prod()); time(preagg())
    time(dimfold())
    (1 to reps).foreach { r =>
      val a = time(scanOnly()); val b = time(joinOnly())
      val c = time(prod()); val d = time(preagg())
      val e = time(dimfold())
      println(f"""{"rep":$r,"scan":$a%.2f,"join":$b%.2f,"prod":$c%.2f,""" +
        f""""preagg":$d%.2f,"dimfold":$e%.2f}""")
    }
    val d1 = prod(); val d2 = preagg(); val d3 = dimfold()
    val eq = d1.exceptAll(d2).count() + d2.exceptAll(d1).count() +
      d1.exceptAll(d3).count() + d3.exceptAll(d1).count()
    println(s"""{"equal":${eq == 0L}}""")
    spark.stop()
  }
}
