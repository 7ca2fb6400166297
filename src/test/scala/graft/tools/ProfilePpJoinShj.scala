package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A/B the PPJoin verify-join STRATEGY at a given dir: production
  * `pairs()` (stats-blind → Spark broadcasts the checkpointed sets
  * side even at 450 MB) vs the same derivation with
  * `hint("shuffle_hash")` on the set sides (the shape a real cluster
  * must take once the doc side outgrows a broadcast). The trade being
  * measured: broadcast ships |docs|·array to every worker and pays a
  * driver collect + GC per run; shuffle ships |pairs|·array across
  * the exchange once.
  */
object ProfilePpJoinShj {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft-scale/x30")
    val runs = sys.env.getOrElse("GRAFT_AB_RUNS", "3").toInt
    val spark = Harness.session()
    val docs = graft.Tables.documents(spark, sfDir)

    def full(hint: Option[String]): DataFrame = {
      val sets = graft.ext.PpJoin.canonicalSets(docs, "doc_id", "text", 3)
      val base = (n: String) => sets.select(col("_id").as("id_" + n),
        sort_array(col("_stoks")).as("_t" + n),
        col("_sz").as("_verify_sz" + n))
      val xa = hint.map(base("a").hint(_)).getOrElse(base("a"))
      val xb = hint.map(base("b").hint(_)).getOrElse(base("b"))
      val tq = 0.5 - 5e-5
      val req = ceil(lit(tq / (1.0 + tq)) *
        (col("_verify_sza") + col("_verify_szb")) - lit(1e-9))
      graft.ext.PpJoin.candidates(sets, 0.5)
        .join(xa, "id_a").join(xb, "id_b")
        .withColumn("_inter", call_function("graft_sorted_overlap",
          col("_ta"), col("_tb"), req))
        .withColumn("jaccard", round(col("_inter").cast("double") /
          (col("_verify_sza") + col("_verify_szb") - col("_inter"))
            .cast("double"), 4))
        .filter(col("jaccard") >= 0.5)
        .select(col("id_a"), col("id_b"), col("jaccard"))
    }

    def noop(f: DataFrame): Double =
      Harness.time(f.write.format("noop").mode("overwrite").save())
    def med(a: Seq[Double]) = a.sorted.apply((a.length - 1) / 2)
    def fmt(a: Seq[Double]) = a.map(x => f"$x%.2f").mkString(",")
    noop(full(None)); noop(full(Some("shuffle_hash"))) // warm
    val tB = collection.mutable.ArrayBuffer.empty[Double]
    val tS = collection.mutable.ArrayBuffer.empty[Double]
    (1 to runs).foreach { _ =>
      tB += noop(full(None)); tS += noop(full(Some("shuffle_hash")))
    }
    println(f"""{"dir":"$sfDir","broadcast_med":${med(tB.toSeq)}%.2f,"shj_med":${med(tS.toSeq)}%.2f,"broadcast":[${fmt(tB.toSeq)}],"shj":[${fmt(tS.toSeq)}]}""")
    spark.stop()
  }
}
