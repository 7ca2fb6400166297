package graft.tools

import org.apache.spark.sql.functions._

/** Same-session A/B of the native PrefixPairs node vs the composed
  * self-join candidates, on the real corpus (and any ScaleCurve x{m}
  * dir via SPARK_GRAFT_SF_DIR). Alternating runs, medians, so a host
  * drift phase cannot masquerade as a plan win.
  */
object ProfilePrefixPairs {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = sys.env.getOrElse("GRAFT_AB_RUNS", "3").toInt
    val spark = Harness.session()
    val docs = graft.Tables.documents(spark, sfDir)

    // the shared canonical-sets build is NOT what's being compared —
    // materialize once
    val sets = graft.ext.PpJoin.canonicalSets(docs, "doc_id", "text", 3)

    def run(f: => org.apache.spark.sql.DataFrame): Double =
      Harness.time(f.write.format("noop").mode("overwrite").save())

    // warm both paths once, untimed
    run(graft.ext.PpJoin.candidates(sets, 0.5))
    run(graft.ext.PpJoin.candidatesComposed(sets, 0.5))
    val native = Array.fill(runs)(0.0)
    val composed = Array.fill(runs)(0.0)
    (0 until runs).foreach { r =>
      native(r) = run(graft.ext.PpJoin.candidates(sets, 0.5))
      composed(r) = run(graft.ext.PpJoin.candidatesComposed(sets, 0.5))
    }
    def med(a: Array[Double]) = a.sorted.apply((a.length - 1) / 2)
    println(f"""{"sf":"$sfDir","native_med":${med(native)}%.2f,"composed_med":${med(composed)}%.2f,"native":[${native.map(x => f"$x%.2f").mkString(",")}],"composed":[${composed.map(x => f"$x%.2f").mkString(",")}]}""")
    spark.stop()
  }
}
