package graft.tools

/** Materialize ScaleCurve's x{m} replica dirs without timing anything
  * — the profiling tools (ProfilePpJoinPhases, ProfileSliceBits, …)
  * point SPARK_GRAFT_SF_DIR / GRAFT_AB_DIR at these, and /tmp does not
  * survive between rounds.
  */
object EnsureScale {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val root = sys.env.getOrElse("GRAFT_SCALE_ROOT", "/tmp/graft-scale")
    val factors = sys.env.getOrElse("GRAFT_SCALE_FACTORS", "30")
      .split(",").map(_.trim.toInt).toSeq
    val spark = Harness.session()
    factors.foreach { m =>
      val dir = ScaleCurve.ensureScaled(spark, sfDir, root, m)
      println(s"""{"scaled":$m,"dir":"$dir"}""")
    }
    spark.stop()
  }
}
