package graft.tools

import org.apache.spark.sql.functions._

/** Pure per-pair kernel cost at a given dir: materialize the PPJoin
  * verify join ONCE (localCheckpoint), then time, over the identical
  * frame, (a) size(array_intersect), (b) graft_sorted_overlap with
  * the production req, (c) graft_sorted_overlap req=0 (no early
  * exit). Consumed by an agg(sum) so no filter pushes the expression
  * into a join condition — exactly one evaluation per pair.
  */
object ProfileOverlapKernel {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft-scale/x10")
    val runs = sys.env.getOrElse("GRAFT_AB_RUNS", "3").toInt
    val spark = Harness.session()
    val docs = graft.Tables.documents(spark, sfDir)
    val sets = graft.ext.PpJoin.canonicalSets(docs, "doc_id", "text", 3)
    val cands = graft.ext.PpJoin.candidates(sets, 0.5)
    val xa = sets.select(col("_id").as("id_a"),
      col("_stoks").as("_ka"), array_sort(col("_stoks")).as("_sa"),
      col("_sz").as("_sza"))
    val xb = sets.select(col("_id").as("id_b"),
      col("_stoks").as("_kb"), array_sort(col("_stoks")).as("_sb"),
      col("_sz").as("_szb"))
    val joined = cands.join(xa, "id_a").join(xb, "id_b").localCheckpoint()
    println("pairs=" + joined.count())
    val tq = 0.5 - 5e-5
    val req = ceil(lit(tq / (1.0 + tq)) * (col("_sza") + col("_szb"))
      - lit(1e-9))
    def t(c: org.apache.spark.sql.Column): Double =
      Harness.time(joined.agg(sum(c)).collect())
    def med(a: Seq[Double]) = a.sorted.apply((a.length - 1) / 2)
    val variants = Seq(
      "intersect" -> size(array_intersect(col("_ka"), col("_kb"))),
      "merge_req" -> call_function("graft_sorted_overlap", col("_sa"),
        col("_sb"), req),
      "merge_no_exit" -> call_function("graft_sorted_overlap", col("_sa"),
        col("_sb"), lit(0L)))
    variants.foreach { case (n, c) => t(c); () } // warm all
    val out = variants.map { case (n, c) =>
      val ts = (1 to runs).map(_ => t(c))
      f""""$n":${med(ts)}%.2f"""
    }
    println("{" + out.mkString(",") + s""","dir":"$sfDir"}""")
    spark.stop()
  }
}
