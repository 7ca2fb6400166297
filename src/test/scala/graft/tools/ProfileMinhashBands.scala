package graft.tools

/** Same-session A/B of the banded-minhash candidate formulations on
  * the real corpus (or a ScaleCurve x{m} dir via SPARK_GRAFT_SF_DIR):
  * the posting-list SELF-JOIN (`Dedup.minhashCandidates`) vs the
  * grouped sorted-pairs stream (`Dedup.minhashCandidatesGrouped`).
  * Alternating runs, medians — the verdict-r13 #8 protocol: build a
  * tier-4 node only if composition demonstrably loses; adopt the
  * grouped composition only if it demonstrably wins.
  */
object ProfileMinhashBands {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = sys.env.getOrElse("GRAFT_AB_RUNS", "3").toInt
    val spark = Harness.session()
    val docs = graft.Tables.documents(spark, sfDir)

    // the shared signature build is NOT what's being compared
    val banded = graft.ext.Dedup.minhashBands(docs, "doc_id", "text")

    def run(f: => org.apache.spark.sql.DataFrame): Double =
      Harness.time(f.write.format("noop").mode("overwrite").save())

    // equal-output sanity before timing anything
    val a = graft.ext.Dedup.minhashCandidates(banded, "doc_id")
    val b = graft.ext.Dedup.minhashCandidatesGrouped(banded, "doc_id")
    val diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    require(diff == 0, s"candidate sets differ by $diff rows")

    run(graft.ext.Dedup.minhashCandidates(banded, "doc_id"))
    run(graft.ext.Dedup.minhashCandidatesGrouped(banded, "doc_id"))
    val joined = Array.fill(runs)(0.0)
    val grouped = Array.fill(runs)(0.0)
    (0 until runs).foreach { r =>
      grouped(r) = run(graft.ext.Dedup.minhashCandidatesGrouped(banded, "doc_id"))
      joined(r) = run(graft.ext.Dedup.minhashCandidates(banded, "doc_id"))
    }
    def med(x: Array[Double]) = x.sorted.apply((x.length - 1) / 2)
    println(f"""{"sf":"$sfDir","grouped_med":${med(grouped)}%.2f,"joined_med":${med(joined)}%.2f,"grouped":[${grouped.map(x => f"$x%.2f").mkString(",")}],"joined":[${joined.map(x => f"$x%.2f").mkString(",")}]}""")
    spark.stop()
  }
}
