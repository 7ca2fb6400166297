package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Executed-plan dump for the two PPJoin verify variants at a given
  * dir — diagnosis for the x10 inversion (merge kernel slower than
  * array_intersect at 10× while 4× faster at 1×).
  */
object PlanPpJoinVerify {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft-scale/x10")
    val spark = Harness.session()
    val docs = graft.Tables.documents(spark, sfDir)
    val sets = graft.ext.PpJoin.canonicalSets(docs, "doc_id", "text", 3)
    val cands = graft.ext.PpJoin.candidates(sets, 0.5).localCheckpoint()
    println("n_cand=" + cands.count())

    def verifyMerge(): DataFrame = {
      val xa = sets.select(col("_id").as("id_a"),
        array_sort(col("_stoks")).as("_ta"), col("_sz").as("_verify_sza"))
      val xb = sets.select(col("_id").as("id_b"),
        array_sort(col("_stoks")).as("_tb"), col("_sz").as("_verify_szb"))
      val tq = 0.5 - 5e-5
      val req = ceil(lit(tq / (1.0 + tq)) *
        (col("_verify_sza") + col("_verify_szb")) - lit(1e-9))
      cands.join(xa, "id_a").join(xb, "id_b")
        .withColumn("_inter", call_function("graft_sorted_overlap",
          col("_ta"), col("_tb"), req))
        .withColumn("jaccard", round(col("_inter").cast("double") /
          (col("_verify_sza") + col("_verify_szb") - col("_inter"))
            .cast("double"), 4))
        .filter(col("jaccard") >= 0.5)
        .select(col("id_a"), col("id_b"), col("jaccard"))
    }
    def verifyIntersect(): DataFrame = {
      val xa = sets.select(col("_id").as("id_a"), col("_stoks").as("_ta"),
        col("_sz").as("_verify_sza"))
      val xb = sets.select(col("_id").as("id_b"), col("_stoks").as("_tb"),
        col("_sz").as("_verify_szb"))
      cands.join(xa, "id_a").join(xb, "id_b")
        .withColumn("_inter", size(array_intersect(col("_ta"), col("_tb"))))
        .withColumn("jaccard", round(col("_inter").cast("double") /
          (col("_verify_sza") + col("_verify_szb") - col("_inter"))
            .cast("double"), 4))
        .filter(col("jaccard") >= 0.5)
        .select(col("id_a"), col("id_b"), col("jaccard"))
    }
    val m = verifyMerge(); m.write.format("noop").mode("overwrite").save()
    println("==== MERGE PLAN ====")
    println(m.queryExecution.executedPlan.toString.take(6000))
    val i = verifyIntersect(); i.write.format("noop").mode("overwrite").save()
    println("==== INTERSECT PLAN ====")
    println(i.queryExecution.executedPlan.toString.take(6000))
    spark.stop()
  }
}
