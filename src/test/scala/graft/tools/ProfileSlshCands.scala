package graft.tools

/** Same-session alternating A/B of the multi-table sign-LSH candidate
  * dedup formulations (map-side first-collision vs joined+distinct) on
  * the FULL nearDupPairsMulti pipeline, on any dir — the only honest
  * comparison on a host with drift phases.
  */
object ProfileSlshCands {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = sys.env.getOrElse("GRAFT_AB_RUNS", "3").toInt
    val spark = Harness.session()
    val emb = graft.Tables.embeddings(spark, dir)

    def run(packed: Boolean): Double = Harness.time {
      graft.ext.SignLsh.nearDupPairsMulti(emb, "vec_id", "embedding",
          bits = 6, tables = 12, minCosine = 0.25, dim = 64,
          firstCollision = packed)
        .write.format("noop").mode("overwrite").save()
    }

    run(packed = true); run(packed = false)
    val p = Array.fill(runs)(0.0)
    val j = Array.fill(runs)(0.0)
    (0 until runs).foreach { r =>
      p(r) = run(packed = true)
      j(r) = run(packed = false)
    }
    def med(a: Array[Double]) = a.sorted.apply((a.length - 1) / 2)
    println(f"""{"dir":"$dir","first_collision_med":${med(p)}%.2f,"joined_med":${med(j)}%.2f,"first_collision":[${p.map(x => f"$x%.2f").mkString(",")}],"joined":[${j.map(x => f"$x%.2f").mkString(",")}]}""")
    spark.stop()
  }
}
