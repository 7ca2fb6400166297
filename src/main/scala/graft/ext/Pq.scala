package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Vectors
import graft.operators.Joins

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
  * Build/probe split (the 100 TB lifecycle): [[trainCodebook]] and
  * [[encode]] produce plain DataFrames — the PQ INDEX — that a caller
  * persists once (e.g. `Versioned.write`) and probes many times via
  * [[adcProbe]], which builds a pure plan: broadcast LUTs + map-only
  * scoring, ZERO jobs at construction and no index-rebuild work.
  * [[adcTopK]] composes all three for the one-shot convenience path.
  *
  * Scale shape: codebooks and query LUTs are tiny and broadcast; the
  * corpus is touched twice at BUILD time — once to train, once to
  * encode (a one-time cost in production) — and probing is map-only
  * over the broadcast LUTs with no shuffle before the per-query top-k
  * window, which moves only k rows per partition.
  */
object Pq {

  /** (id, sub, subvec) — one row per subspace slice of `_uv`. */
  private def subs(df: DataFrame, id: String, m: Int, w: Int): DataFrame =
    df.select(col(id),
      posexplode(array((0 until m).map(s =>
        slice(col("_uv"), s * w + 1, w)): _*)).as(Seq("sub", "_sv")))

  /** Train the codebook: per (subspace, block) positional mean, rounded
    * to 4 decimals so the codewords are deterministic across
    * partitionings/engines, plus a dense positional `code` per
    * subspace (block ids are any orderable values, not 0..n-1).
    *
    * Pure plan — no action; callers materialize (checkpoint/persist)
    * as their lifecycle requires. Schema: (sub, cw, _cw, code).
    */
  def trainCodebook(corpus: DataFrame, vecCol: String, blockCol: String,
      m: Int, dim: Int): DataFrame = {
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val w = dim / m
    Vectors.unitized(corpus, vecCol, blockCol -> "_cell")
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
      // cw, so lookups must use the cw's POSITION, not its raw value
      .withColumn("code", row_number().over(
        Window.partitionBy(col("sub")).orderBy(col("cw"))) - 1)
  }

  /** Encode the corpus against a trained codebook: nearest codeword per
    * (row, subspace) by L2 on the subvector, codes packed into one
    * array per row in subspace order. Pure plan. Schema: (c_id, _codes).
    */
  def encode(corpus: DataFrame, cId: String, vecCol: String,
      codebook: DataFrame, m: Int, dim: Int): DataFrame = {
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val w = dim / m
    // Arg-min codeword per (row, subspace) as min(packed long), NOT a
    // row_number window: the window sorts |corpus|·m·|codewords| rows
    // on one exchange, while min(long) partial-aggregates map-side
    // through a HashAggregate (min(struct) would force SortAggregate —
    // same packing trick as record_linkage). The 9-decimal-quantized
    // distance occupies the high bits, the dense code the low 16, so
    // packed order == (round(d2,9) asc, code asc) — and code order ==
    // cw order by construction ([[trainCodebook]]), matching the
    // documented (d2, cw) tie-break exactly. d2 of unit-vector slices
    // is ≤ 4, so the pack stays far inside Long range; the 2^16
    // codewords-per-subspace capacity is ENFORCED below (raise_error
    // on the broadcast codebook), not merely assumed.
    // fail LOUDLY past the pack's 16-bit code capacity: a codebook
    // with >= 2^16 codewords in one subspace would bleed code bits
    // into the distance bits and `_pk % 65536` would recover the
    // WRONG code — silent corruption. Guarded on the tiny broadcast
    // side (per codebook row, not per corpus row), mirroring
    // mixtureShards' weight guard.
    val guarded = codebook.withColumn("code",
      when(col("code") < 65536, col("code"))
        .otherwise(raise_error(concat(
          lit("Pq.encode: codebook exceeds 65536 codewords in subspace "),
          col("sub").cast("string")))))
    subs(Vectors.unitized(corpus, vecCol, cId -> "c_id"), "c_id", m, w)
      .join(broadcast(guarded), Seq("sub"))
      .withColumn("_d2",
        Vectors.dot(col("_sv"), col("_sv"))
          - lit(2) * Vectors.dot(col("_sv"), col("_cw"))
          + Vectors.dot(col("_cw"), col("_cw")))
      .withColumn("_pk",
        // round(_d2, 9) FIRST — the exact quantization the oracle (and
        // the old window) ranked by; the outer round only recovers the
        // integer from (k/1e9)*1e9's last-ulp wobble. Rounding the
        // scaled product directly could land one quantum off the
        // 9-decimal half-up boundary and pick a different codeword
        // than the SQL replay.
        greatest(round(round(col("_d2"), 9) * lit(1e9)), lit(0.0))
          .cast("long") * lit(65536L) + col("code"))
      .groupBy(col("c_id"), col("sub"))
      .agg(min(col("_pk")).as("_pk"))
      .withColumn("code", (col("_pk") % 65536L).cast("int"))
      .groupBy(col("c_id"))
      .agg(array_sort(collect_list(struct(col("sub"), col("code")))).as("_sc"))
      .select(col("c_id"),
        transform(col("_sc"), s => s.getField("code")).as("_codes"))
  }

  /** Probe a prebuilt index: query LUTs against the broadcast codebook,
    * then m lookups + adds per (query, corpus row) in fixed subspace
    * order (bit-reproducible float sum). Pure plan — constructing it
    * launches ZERO jobs and never rebuilds the index (PqSpec pins
    * this), so a persisted index amortizes across every probe.
    *
    * @param codebook output of [[trainCodebook]] (or a persisted copy)
    * @param codes    output of [[encode]] (or a persisted copy)
    */
  def adcProbe(queries: DataFrame, qId: String, vecCol: String,
      codebook: DataFrame, codes: DataFrame, m: Int, dim: Int,
      k: Int): DataFrame = {
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val w = dim / m
    // query LUT: lut[sub][cw] = dot(q subvector, codeword) — nested
    // array ordered by (sub, cw) so ADC is pure positional lookup
    val qlut = subs(Vectors.unitized(queries, vecCol, qId -> "q_id"),
        "q_id", m, w)
      .join(broadcast(codebook), Seq("sub"))
      .withColumn("_dp", Vectors.dot(col("_sv"), col("_cw")))
      .groupBy(col("q_id"), col("sub"))
      .agg(array_sort(collect_list(struct(col("cw"), col("_dp")))).as("_cd"))
      .withColumn("_l", transform(col("_cd"), s => s.getField("_dp")))
      .groupBy(col("q_id"))
      .agg(array_sort(collect_list(struct(col("sub"), col("_l")))).as("_sl"))
      .select(col("q_id"),
        transform(col("_sl"), s => s.getField("_l")).as("_lut"))
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
  }

  /** One-shot convenience: train + encode (materialized under
    * graph-sized shuffles) + probe.
    *
    * @param dim embedding dimensionality; pass it when known (the
    *            usual case — it is part of the table contract) so the
    *            call launches NO pre-shuffle sizing jobs. Left at -1,
    *            a 1-row probe job reads it from the data.
    * @return (q_id, rank, neighbor_id, adc_cosine) — approximate
    *         cosine top-k per query via asymmetric distance computation.
    */
  def adcTopK(queries: DataFrame, corpus: DataFrame, qId: String,
      cId: String, vecCol: String, blockCol: String, m: Int,
      k: Int, dim: Int = -1): DataFrame = {
    val spark = corpus.sparkSession
    val d = if (dim > 0) dim
      else corpus.select(size(col(vecCol))).head().getInt(0)
    require(d % m == 0, s"dim $d not divisible into $m subspaces")
    // the index-build shuffles move (id, sub, code/dot) triples — size
    // them to corpus × m, not the session-wide batch setting. Sizing
    // comes from plan statistics (Joins.estimatedRows): ZERO jobs, and
    // both clamps keep a bad estimate harmless (floor 4, cap = session
    // setting).
    val savedParts = spark.conf.get("spark.sql.shuffle.partitions")
    val nRows = Joins.estimatedRows(corpus)
    spark.conf.set("spark.sql.shuffle.partitions",
      math.max(4L, math.min(savedParts.toLong, nRows * m / 100000L)).toString)
    try {
      // materialized: these ARE the PQ index — built once under the
      // right-sized shuffles, probed many times
      val codebook = trainCodebook(corpus, vecCol, blockCol, m, d)
        .localCheckpoint()
      val codes = encode(corpus, cId, vecCol, codebook, m, d)
        .localCheckpoint()
      adcProbe(queries, qId, vecCol, codebook, codes, m, d, k)
    } finally spark.conf.set("spark.sql.shuffle.partitions", savedParts)
  }
}
