package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Vectors

/** Product-quantization ANN (ADC flavor): vectors are split into `m`
  * subspaces, each subspace gets a small codebook, and every corpus
  * vector is stored as `m` small codes. A query builds a lookup table
  * (dot product of its subvector against every codeword, per
  * subspace); scoring a corpus vector is then `m` table lookups + adds
  * instead of a full-dimension dot product — the classic memory/compute
  * trade (Jégou et al., "Product Quantization for Nearest Neighbor
  * Search", reference: the ANN scale path beside IVF in
  * `Similarity.ivfTopK`).
  *
  * Codebooks here are per-block subspace means (one Lloyd update from
  * the `blockCol` partition — same deterministic-training simplification
  * as `ivfTopK`'s cells, rounded to 4 decimals), so encoding, LUTs and
  * ADC scores are all exactly reproducible and the whole approximate
  * pipeline is oracle-checkable. Ranking rounds at 9 decimals with id
  * tie-break, like every ranked operator in the engine.
  *
  * Scale shape: codebooks and query LUTs are tiny and broadcast; the
  * corpus is touched twice — once to encode (one shuffle of (id, sub,
  * code) triples; a one-time index build in production), once to score
  * (map-only probe over the broadcast LUTs; no shuffle before the
  * per-query top-k window, which moves only k rows per partition).
  */
object Pq {

  /** @return (q_id, rank, neighbor_id, adc_cosine) — approximate
    *         cosine top-k per query via asymmetric distance computation.
    */
  def adcTopK(queries: DataFrame, corpus: DataFrame, qId: String,
      cId: String, vecCol: String, blockCol: String, m: Int,
      k: Int): DataFrame = {
    val spark = corpus.sparkSession
    val dim = corpus.select(size(col(vecCol))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val w = dim / m
    // the index-build shuffles move (id, sub, code/dot) triples — size
    // them to corpus × m, not the session-wide batch setting
    val savedParts = spark.conf.get("spark.sql.shuffle.partitions")
    val nRows = corpus.count()
    spark.conf.set("spark.sql.shuffle.partitions",
      math.max(4L, math.min(savedParts.toLong, nRows * m / 100000L)).toString)
    try {

    def unitize(df: DataFrame, id: String, idAs: String): DataFrame =
      Vectors.unitized(df, vecCol, id -> idAs)

    // (id, sub, subvec) — one row per subspace slice
    def subs(df: DataFrame, id: String): DataFrame =
      df.select(col(id),
          posexplode(array((0 until m).map(s =>
            slice(col("_uv"), s * w + 1, w)): _*)).as(Seq("sub", "_sv")))

    val cu = Vectors.unitized(corpus, vecCol,
        cId -> "c_id", blockCol -> "_cell")
      .cache()

    // codebook: per (subspace, block) positional mean, rounded so the
    // trained codewords are deterministic across partitionings/engines
    val codebook = cu
      .select(col("_cell"),
        posexplode(array((0 until m).map(s =>
          slice(col("_uv"), s * w + 1, w)): _*)).as(Seq("sub", "_sv")))
      .select(col("_cell"), col("sub"),
        posexplode(col("_sv")).as(Seq("_pos", "_x")))
      .groupBy(col("sub"), col("_cell").as("cw"), col("_pos"))
      .agg(round(avg(col("_x")), 4).as("_mv"))
      .groupBy(col("sub"), col("cw"))
      .agg(array_sort(collect_list(struct(col("_pos"), col("_mv")))).as("_pm"))
      .select(col("sub"), col("cw"),
        transform(col("_pm"), s => s.getField("_mv")).as("_cw"))
      // dense positional code per subspace: the LUT below is ordered by
      // cw, so lookups must use the cw's POSITION, not its raw value —
      // block ids are any orderable values, not necessarily 0..n-1
      .withColumn("code", row_number().over(
        Window.partitionBy(col("sub")).orderBy(col("cw"))) - 1)
      .localCheckpoint()

    // encode: nearest codeword per (corpus row, subspace) by L2 on the
    // subvector; codes packed into one array per row, subspace order
    val encW = Window.partitionBy(col("c_id"), col("sub"))
      .orderBy(round(col("_d2"), 9).asc, col("cw").asc)
    val codes = subs(cu, "c_id")
      .join(broadcast(codebook), Seq("sub"))
      .withColumn("_d2",
        Vectors.dot(col("_sv"), col("_sv"))
          - lit(2) * Vectors.dot(col("_sv"), col("_cw"))
          + Vectors.dot(col("_cw"), col("_cw")))
      .withColumn("_rn", row_number().over(encW))
      .filter(col("_rn") === 1)
      .groupBy(col("c_id"))
      .agg(array_sort(collect_list(struct(col("sub"), col("code")))).as("_sc"))
      .select(col("c_id"),
        transform(col("_sc"), s => s.getField("code")).as("_codes"))
      // materialized: this IS the PQ index — built once under the
      // right-sized shuffles, probed many times
      .localCheckpoint()

    // query LUT: lut[sub][cw] = dot(q subvector, codeword) — nested
    // array ordered by (sub, cw) so ADC is pure positional lookup
    val qlut = subs(unitize(queries, qId, "q_id"), "q_id")
      .join(broadcast(codebook), Seq("sub"))
      .withColumn("_dp", Vectors.dot(col("_sv"), col("_cw")))
      .groupBy(col("q_id"), col("sub"))
      .agg(array_sort(collect_list(struct(col("cw"), col("_dp")))).as("_cd"))
      .withColumn("_l", transform(col("_cd"), s => s.getField("_dp")))
      .groupBy(col("q_id"))
      .agg(array_sort(collect_list(struct(col("sub"), col("_l")))).as("_sl"))
      .select(col("q_id"),
        transform(col("_sl"), s => s.getField("_l")).as("_lut"))
      .localCheckpoint()

    // ADC: m lookups + adds per (query, corpus row), fixed subspace
    // order so the float sum is bit-reproducible
    val adc: Column = (0 until m).map(s =>
        element_at(element_at(col("_lut"), s + 1),
          element_at(col("_codes"), s + 1).cast("int") + 1))
      .reduce(_ + _)
    val rankW = Window.partitionBy(col("q_id"))
      .orderBy(round(col("_adc"), 9).desc, col("c_id").asc)
    codes.join(broadcast(qlut), col("q_id") =!= col("c_id"))
      .withColumn("_adc", adc)
      .withColumn("rank", row_number().over(rankW).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("c_id").as("neighbor_id"),
        round(col("_adc"), 6).as("adc_cosine"))
    } finally spark.conf.set("spark.sql.shuffle.partitions", savedParts)
  }
}
