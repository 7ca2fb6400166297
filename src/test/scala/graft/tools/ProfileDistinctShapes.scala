package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A/B the remaining multi-count_distinct Expand sites (r16, after
  * profile_columns/profile_keys):
  *  - sketch_hll_setops' exact branch: three distincts over the SAME
  *    column → one user-grain groupBy with membership flags, then a
  *    1-row fold (no Expand, one exchange).
  *  - distinct_agg: grouped two-column distincts → one grouped
  *    count-distinct leg per column joined on the tiny group key
  *    (no ×3 row replication; AQE broadcasts the 3-row sides).
  */
object ProfileDistinctShapes {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("GRAFT_AB_DIR", "/tmp/graft-scale/x30")
    val reps = sys.env.getOrElse("GRAFT_AB_REPS", "6").toInt
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)

    def hllProd(): DataFrame =
      graft.queries.AnalyticsQueries.sketchHllSetops(spark, dir)

    def hllTagged(): DataFrame = {
      val ev = graft.Tables.events(spark, dir)
        .filter(col("event_type").isin("click", "view"))
        .select(col("event_type").as("s"), col("user_id"))
      val regs = graft.ext.Hll.registers(ev, Seq("s"), "user_id")
      val perSet = graft.ext.Hll.estimate(regs, Seq("s"), "est")
      val union = graft.ext.Hll.estimate(
        regs.groupBy(col("_b")).agg(max(col("_m")).as("_m"))
          .withColumn("u", lit(1)),
        Seq("u"), "est_union").drop("u")
      val perUser = ev.groupBy(col("user_id"))
        .agg(max(when(col("s") === "click", 1).otherwise(0)).as("_c"),
          max(when(col("s") === "view", 1).otherwise(0)).as("_v"))
      val nn = col("user_id").isNotNull
      val exact = perUser.agg(
        count(when(col("_c") === 1 && nn, 1)).as("exact_click"),
        count(when(col("_v") === 1 && nn, 1)).as("exact_view"),
        count(when(nn, 1)).as("exact_union"))
      val a = perSet.filter(col("s") === "click")
        .select(col("est").as("est_click"))
      val b = perSet.filter(col("s") === "view")
        .select(col("est").as("est_view"))
      a.crossJoin(b).crossJoin(union).crossJoin(exact)
        .select(col("est_click"), col("est_view"), col("est_union"),
          (col("est_click") + col("est_view") - col("est_union"))
            .as("est_intersect"),
          col("exact_click"), col("exact_view"), col("exact_union"))
    }

    def daProd(): DataFrame =
      graft.queries.AnalyticsQueries.distinctAgg(spark, dir)

    def daLegs(): DataFrame = {
      val li = graft.Tables.lineitem(spark, dir)
      val parts = li.groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("n_parts"))
      val supps = li.groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_suppkey")).as("n_supps"))
      val rows = li.groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_rows"))
      parts.join(supps, "l_returnflag").join(rows, "l_returnflag")
        .orderBy("l_returnflag")
    }

    def time(f: => DataFrame): Double = {
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    time(hllProd()); time(hllTagged()); time(daProd()); time(daLegs())
    (1 to reps).foreach { r =>
      val a = time(hllProd()); val b = time(hllTagged())
      val c = time(daProd()); val d = time(daLegs())
      println(f"""{"rep":$r,"hll_prod":$a%.2f,"hll_tag":$b%.2f,"da_prod":$c%.2f,"da_legs":$d%.2f}""")
    }
    val eq = hllProd().exceptAll(hllTagged()).count() +
      hllTagged().exceptAll(hllProd()).count() +
      daProd().exceptAll(daLegs()).count() +
      daLegs().exceptAll(daProd()).count()
    println(s"""{"equal":${eq == 0L}}""")
    spark.stop()
  }
}
