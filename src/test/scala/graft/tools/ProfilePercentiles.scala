package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Canary-relative stage-split + variant A/B for `percentiles`
  * (VERDICT r20 #5): the row's 30× evidence predates the
  * ProfileRegionalJoin protocol — redone here with alternating reps
  * and canary stamps at both ends, at sf0.1 and any GRAFT_AB_DIR
  * (point it at an EnsureScale x30 replica for the 30× redo).
  *
  * Variants (every full variant returns the identical result —
  * cross-checked before timing):
  *  - production: the two-pass selection core
  *    ([[graft.ext.Quantiles.groupedExact]] — (group,slice) histogram,
  *    then gather only the slices holding the order statistics);
  *  - agg3: the `percentile` aggregate twin — THREE TypedImperative
  *    buffers, each holding every (value,count) of its group;
  *  - agg1: ONE `percentile(v, array(0.5,0.9,0.99))` buffer — same
  *    aggregate machinery, a third of the buffer builds/merges (the
  *    measured alternative for the aggregate form);
  *  - floors: one and two 2-column scans of orders (the selection
  *    core's pass structure is scan + bounded gather, so 2 scans is
  *    its theoretical floor; the twin's floor is 1 in-process sort).
  */
object ProfilePercentiles {

  private def agg3(spark: SparkSession, dir: String): DataFrame =
    graft.queries.SetOpQueries.percentilesAgg(spark, dir)

  private def agg1(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(
        expr("percentile(o_totalprice, array(0.5D, 0.9D, 0.99D))").as("_ps"),
        count(lit(1)).as("n"))
      .select(col("o_orderpriority"),
        round(element_at(col("_ps"), 1), 4).as("p50"),
        round(element_at(col("_ps"), 2), 4).as("p90"),
        round(element_at(col("_ps"), 3), 4).as("p99"),
        col("n"))
      .orderBy("o_orderpriority")

  private def scan(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.orders(spark, dir)
      .select(col("o_orderpriority"), col("o_totalprice"))

  /** The selection core's pass-1 histogram, verbatim (slice = top
    * 12+10 bits of the order-isomorphic long) — used to A/B the
    * executeTake scale-up in isolation: `take(histCap+1)` under the
    * default 1-partition first round vs the forced single round the
    * r21 fetchHist uses.
    */
  private def hist(spark: SparkSession, dir: String): DataFrame = {
    val v = col("o_totalprice").cast("double")
    graft.Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority").cast("string").as("g"),
        coalesce(shiftright(call_function("graft_sortable_bits", v), 42),
          lit(Long.MinValue)).as("h"))
      .agg(count(lit(1)).as("c"), min(v).as("mn"), max(v).as("mx"))
  }

  private def timedTake(spark: SparkSession, dir: String,
      initialParts: String): Double = {
    val key = "spark.sql.limit.initialNumPartitions"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key, initialParts)
    try Harness.time(hist(spark, dir).take((1 << 21) + 1))
    finally saved match {
      case Some(x) => spark.conf.set(key, x)
      case None => spark.conf.unset(key)
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("GRAFT_AB_DIR", "/root/testdata/sf0.1")
    val runs = sys.env.getOrElse("GRAFT_AB_RUNS", "5").toInt
    val spark = Harness.session()

    def noop(f: => DataFrame): Double =
      Harness.time(f.write.format("noop").mode("overwrite").save())
    def med(a: Seq[Double]) = a.sorted.apply((a.length - 1) / 2)

    def prod(): DataFrame =
      graft.queries.SetOpQueries.percentiles(spark, sfDir)

    // result equality across variants (also warms all paths)
    val base = prod().collect().toSeq
    require(agg3(spark, sfDir).collect().toSeq == base, "agg3 diverges")
    require(agg1(spark, sfDir).collect().toSeq == base, "agg1 diverges")

    val c0 = graft.Bench.canary(spark, 32)
    val tProd = new scala.collection.mutable.ArrayBuffer[Double]
    val tAgg3 = new scala.collection.mutable.ArrayBuffer[Double]
    val tAgg1 = new scala.collection.mutable.ArrayBuffer[Double]
    val tScan1 = new scala.collection.mutable.ArrayBuffer[Double]
    val tScan2 = new scala.collection.mutable.ArrayBuffer[Double]
    val tTake1 = new scala.collection.mutable.ArrayBuffer[Double]
    val tTakeAll = new scala.collection.mutable.ArrayBuffer[Double]
    (1 to runs).foreach { _ =>
      tProd += noop(prod())
      tAgg3 += noop(agg3(spark, sfDir))
      tAgg1 += noop(agg1(spark, sfDir))
      tScan1 += noop(scan(spark, sfDir))
      tScan2 += Harness.time {
        scan(spark, sfDir).write.format("noop").mode("overwrite").save()
        scan(spark, sfDir).write.format("noop").mode("overwrite").save()
      }
      tTake1 += timedTake(spark, sfDir, "1")
      tTakeAll += timedTake(spark, sfDir, Int.MaxValue.toString)
    }
    val c1 = graft.Bench.canary(spark, 32)

    println(f"""{"sf":"$sfDir","canary":[$c0%.3f,$c1%.3f],"prod_med":${med(tProd.toSeq)}%.2f,"agg3_med":${med(tAgg3.toSeq)}%.2f,"agg1_med":${med(tAgg1.toSeq)}%.2f,"scan1_med":${med(tScan1.toSeq)}%.2f,"scan2_med":${med(tScan2.toSeq)}%.2f,"take1_med":${med(tTake1.toSeq)}%.2f,"takeall_med":${med(tTakeAll.toSeq)}%.2f,"prod":[${tProd.map(x => f"$x%.2f").mkString(",")}],"agg3":[${tAgg3.map(x => f"$x%.2f").mkString(",")}],"agg1":[${tAgg1.map(x => f"$x%.2f").mkString(",")}],"scan1":[${tScan1.map(x => f"$x%.2f").mkString(",")}],"scan2":[${tScan2.map(x => f"$x%.2f").mkString(",")}],"take1":[${tTake1.map(x => f"$x%.2f").mkString(",")}],"takeall":[${tTakeAll.map(x => f"$x%.2f").mkString(",")}]}""")
    spark.stop()
  }
}
