package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Phase-split of dedup_ppjoin (r18 verdict #6): canonical-set build
  * vs candidate generation vs verify (join-back + array_intersect),
  * on the real corpus or any ScaleCurve x{m} dir via
  * SPARK_GRAFT_SF_DIR. Each phase materializes its input first
  * (localCheckpoint) so the timings don't telescope; medians over
  * GRAFT_AB_RUNS alternating runs so a host drift phase can't
  * masquerade as a phase weight.
  */
object ProfilePpJoinPhases {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = sys.env.getOrElse("GRAFT_AB_RUNS", "3").toInt
    val spark = Harness.session()
    val docs = graft.Tables.documents(spark, sfDir)

    def noop(f: => DataFrame): Double =
      Harness.time(f.write.format("noop").mode("overwrite").save())

    def med(a: Seq[Double]) = a.sorted.apply((a.length - 1) / 2)

    // phase 1: shingle + df + canonical sort (the localCheckpoint in
    // canonicalSets forces it; timing the call is the phase)
    val tSets = (1 to runs).map { _ =>
      Harness.time(graft.ext.PpJoin.canonicalSets(docs, "doc_id", "text", 3))
    }
    val sets = graft.ext.PpJoin.canonicalSets(docs, "doc_id", "text", 3)

    // phase 2: prefix candidates off the materialized sets
    val tCand = (1 to runs).map { _ =>
      noop(graft.ext.PpJoin.candidates(sets, 0.5))
    }
    val cands = graft.ext.PpJoin.candidates(sets, 0.5).localCheckpoint()
    val nCand = cands.count()

    // phase 3: verify, production shape — lexicographic sort per doc,
    // join back by id, native sorted-merge overlap with early exit
    def verify(): DataFrame = {
      val xa = sets.select(col("_id").as("id_a"),
        sort_array(col("_stoks")).as("_ta"), col("_sz").as("_verify_sza"))
      val xb = sets.select(col("_id").as("id_b"),
        sort_array(col("_stoks")).as("_tb"), col("_sz").as("_verify_szb"))
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
    val tVer = (1 to runs).map(_ => noop(verify()))

    // phase 3a: the verify JOINs alone (ship the arrays, compute a
    // trivial column) — isolates exchange volume from intersect CPU
    def joinOnly(): DataFrame = {
      val xa = sets.select(col("_id").as("id_a"), col("_stoks").as("_ta"),
        col("_sz").as("_verify_sza"))
      val xb = sets.select(col("_id").as("id_b"), col("_stoks").as("_tb"),
        col("_sz").as("_verify_szb"))
      cands.join(xa, "id_a").join(xb, "id_b")
        .select(col("id_a"), col("id_b"),
          (size(col("_ta")) + size(col("_tb"))).as("_x"))
    }
    val tJoin = (1 to runs).map(_ => noop(joinOnly()))

    // phase 3b: the r18 verify shape — per-pair array_intersect over
    // the canonical (df-ordered) arrays, the A/B reference the shipped
    // sorted-merge kernel (graft_sorted_overlap) is measured against
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
    val tVerInt = (1 to runs).map(_ => noop(verifyIntersect()))

    // reference: the full query end-to-end
    val tFull = (1 to runs).map { _ =>
      noop(graft.ext.PpJoin.pairs(docs, "doc_id", "text", 3, 0.5))
    }

    println(f"""{"sf":"$sfDir","n_cand":$nCand,"sets_med":${med(tSets)}%.2f,"cand_med":${med(tCand)}%.2f,"join_med":${med(tJoin)}%.2f,"verify_merge_med":${med(tVer)}%.2f,"verify_intersect_med":${med(tVerInt)}%.2f,"full_med":${med(tFull)}%.2f,"sets":[${tSets.map(x => f"$x%.2f").mkString(",")}],"cand":[${tCand.map(x => f"$x%.2f").mkString(",")}],"join":[${tJoin.map(x => f"$x%.2f").mkString(",")}],"verify_merge":[${tVer.map(x => f"$x%.2f").mkString(",")}],"verify_intersect":[${tVerInt.map(x => f"$x%.2f").mkString(",")}],"full":[${tFull.map(x => f"$x%.2f").mkString(",")}]}""")
    spark.stop()
  }
}
