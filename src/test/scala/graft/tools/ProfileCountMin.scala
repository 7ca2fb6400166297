package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Paired A/B for the r21 `sketch_countmin` probe-set change: the old
  * form's third corpus scan (distinct probes) vs deriving probes from
  * the exact-count aggregate the query joins anyway. Old form
  * reconstructed inline; equality cross-checked first.
  */
object ProfileCountMin {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("GRAFT_AB_DIR", "/root/testdata/sf0.1")
    val runs = sys.env.getOrElse("GRAFT_AB_RUNS", "5").toInt
    val spark = Harness.session()

    def oldForm(): DataFrame = {
      val ev = graft.Tables.events(spark, sf)
      val sk = graft.ext.CountMin.sketch(ev, "user_id")
      val probes = ev.filter(col("user_id").isNotNull)
        .select(col("user_id")).distinct()
      graft.ext.CountMin.estimate(sk, probes, "user_id", "cm_estimate")
        .join(ev.groupBy(col("user_id")).agg(count(lit(1)).as("exact_n")),
          Seq("user_id"))
        .orderBy("user_id")
    }
    def newForm(): DataFrame =
      graft.SparkEntry.queries("sketch_countmin")(spark, sf)

    require(oldForm().collect().toSeq == newForm().collect().toSeq,
      "countmin forms diverge")
    def noop(f: => DataFrame): Double =
      Harness.time(f.write.format("noop").mode("overwrite").save())
    def med(a: Seq[Double]) = a.sorted.apply((a.length - 1) / 2)
    val c0 = graft.Bench.canary(spark, 32)
    val o = new scala.collection.mutable.ArrayBuffer[Double]
    val n = new scala.collection.mutable.ArrayBuffer[Double]
    (1 to runs).foreach { _ => o += noop(oldForm()); n += noop(newForm()) }
    val c1 = graft.Bench.canary(spark, 32)
    println(f"""{"canary":[$c0%.3f,$c1%.3f],"old_med":${med(o.toSeq)}%.2f,"new_med":${med(n.toSeq)}%.2f,"old":[${o.map(x => f"$x%.2f").mkString(",")}],"new":[${n.map(x => f"$x%.2f").mkString(",")}]}""")
    spark.stop()
  }
}
