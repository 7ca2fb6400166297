package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Vectors

/** Approximate-nearest-neighbor search over an embedding column.
  *
  *  - [[bruteForceTopK]]: exact baseline — broadcast the (small) query
  *    set against the corpus, rank per query. Corpus-side work is a
  *    single scan; at 100 TB the corpus partitions stream through the
  *    broadcast probe with no shuffle before the final per-query top-k
  *    (which moves only k rows per query per partition thanks to
  *    window-TopK pushdown / partial aggregation).
  *  - [[ivfTopK]]: IVF-style scale path — centroids from a blocking
  *    column (cluster assignment), queries probe only the `nprobe`
  *    nearest cells, cutting the scanned corpus fraction to
  *    ~nprobe/ncells.
  *
  * Ranking ties: scores are ranked on a 9-decimal rounding with the
  * corpus id as tie-break, making top-k reproducible across engines
  * and run-to-run (float ulp differences cannot flip the order).
  */
object Similarity {

  /** Project (id, unit-normalized double vector) — norms are computed
    * once per row here so the pairwise stage is a single dot product
    * (cosine of unit vectors), not dot + two norm recomputations.
    */
  private[ext] def unitized(df: DataFrame, id: String, vecCol: String,
      idAs: String, vecAs: String): DataFrame =
    df.select(col(id).as(idAs), Vectors.asDouble(col(vecCol)).as("_v"))
      .withColumn("_n", Vectors.norm(col("_v")))
      .select(col(idAs),
        when(col("_n") > 0, transform(col("_v"), x => x / col("_n")))
          .otherwise(col("_v")).as(vecAs))

  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
      qId: String, cId: String, vecCol: String, k: Int): DataFrame = {
    val q = unitized(queries, qId, vecCol, "q_id", "_qv")
    val c = unitized(corpus, cId, vecCol, "c_id", "_cv")
    val scored = c.join(broadcast(q), col("q_id") =!= col("c_id"))
      .withColumn("cosine", Vectors.dot(col("_qv"), col("_cv")))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(round(col("cosine"), 9).desc, col("c_id").asc)
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("c_id").as("neighbor_id"),
        round(col("cosine"), 6).as("cosine"))
  }

  /** IVF: cell centroids = mean vector per `blockCol`; each query
    * probes the `nprobe` nearest centroids and scans only those cells.
    * Returns the same schema as [[bruteForceTopK]] (approximate
    * results).
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame,
      qId: String, cId: String, vecCol: String, blockCol: String,
      k: Int, nprobe: Int): DataFrame = {
    // consumed by both the centroid build and the probe scan —
    // deliberately NOT cached: normalizing is cheap map work, and at
    // scale the full normalized corpus is exactly what must never be
    // pinned in storage memory (a cache here also outlives the query
    // in the session's CacheManager). Two scans of the source beat one
    // materialization of it.
    val c = corpus
      .select(col(blockCol).as("_cell"), col(cId).as("c_id"),
        Vectors.asDouble(col(vecCol)).as("_v"))
      .withColumn("_n", Vectors.norm(col("_v")))
      .select(col("_cell"), col("c_id"),
        when(col("_n") > 0, transform(col("_v"), x => x / col("_n")))
          .otherwise(col("_v")).as("_cv"))
    // centroid per cell: positional mean via explode + groupBy(cell,
    // pos). Components are rounded to 4 decimals so centroids are
    // DETERMINISTIC across partition orderings, replicas and engines
    // (float summation order can wiggle the last ulps; the probe
    // ranking then re-rounds at 9 decimals) — which is what makes this
    // approximate operator exactly oracle-checkable.
    val centroids = c
      .select(col("_cell"), posexplode(col("_cv")).as(Seq("_pos", "_x")))
      .groupBy(col("_cell"), col("_pos"))
      .agg(round(avg(col("_x")), 4).as("_m"))
      .groupBy(col("_cell"))
      .agg(array_sort(collect_list(struct(col("_pos"), col("_m")))).as("_pm"))
      .select(col("_cell"), transform(col("_pm"), s => s.getField("_m")).as("_centroid"))

    val q = unitized(queries, qId, vecCol, "q_id", "_qv")
    val probeW = Window.partitionBy(col("q_id"))
      .orderBy(round(Vectors.cosine(col("_qv"), col("_centroid")), 9).desc, col("_cell").asc)
    val probes = q.crossJoin(broadcast(centroids))
      .withColumn("_probe_rank", row_number().over(probeW))
      .filter(col("_probe_rank") <= nprobe)
      .select(col("q_id"), col("_qv"), col("_cell"))

    val scored = c.join(broadcast(probes), Seq("_cell"))
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("cosine", Vectors.dot(col("_qv"), col("_cv")))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(round(col("cosine"), 9).desc, col("c_id").asc)
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("c_id").as("neighbor_id"),
        round(col("cosine"), 6).as("cosine"))
  }
}
