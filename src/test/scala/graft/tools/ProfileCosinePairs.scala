package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A/B for dedup_embedding_cosine (r16: the repo's worst data row —
  * 46.8 s vs a 2.9 s DuckDB twin at 30×): the blocked self-join
  * capped parallelism at |labels| (10) and paid ~2 µs/pair of
  * join-row machinery. Variants:
  *  - joined: the r15 blocked self-join (oracle derivation)
  *  - salted: salt decomposition + graft_cosine_pairs grouped kernel
  *    (production after r16)
  */
object ProfileCosinePairs {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("GRAFT_AB_DIR", "/tmp/graft-scale/x30")
    val reps = sys.env.getOrElse("GRAFT_AB_REPS", "5").toInt
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)

    def joined(): DataFrame =
      graft.ext.Dedup.embeddingNearDupsJoined(
          graft.Tables.embeddings(spark, dir), "vec_id", "embedding",
          blockCol = "label", minCosine = 0.3)
        .orderBy("label", "id_a", "id_b")

    def salted(): DataFrame =
      graft.queries.SimilarityQueries.dedupEmbeddingCosine(spark, dir)

    def time(f: => DataFrame): Double = {
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    time(salted())
    (1 to reps).foreach { r =>
      val a = time(joined()); val b = time(salted())
      println(f"""{"rep":$r,"joined":$a%.2f,"salted":$b%.2f}""")
    }
    val d1 = joined(); val d2 = salted()
    val eq = d1.exceptAll(d2).count() + d2.exceptAll(d1).count()
    println(s"""{"equal":${eq == 0L}}""")
    spark.stop()
  }
}
