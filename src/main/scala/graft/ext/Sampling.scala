package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash-based sampling — how a training pipeline takes
  * reproducible samples and train/test splits at any scale: membership
  * is a pure function of the row key (no RNG state, no seed-per-
  * partition nondeterminism), so a sample is stable across re-runs,
  * engines, repartitioning and incremental arrival, and two samples
  * with nested thresholds are nested (a 10% sample is a subset of the
  * 50% sample). Embarrassingly parallel map-side filter, zero shuffle.
  *
  * Buckets are the first two hex chars of md5(key) — 256 equal-ish
  * buckets; a threshold of "19" keeps buckets 00..19 = 26/256 ≈ 10.2%.
  * md5 keeps it engine-portable (the DuckDB oracle reproduces
  * membership bit-for-bit).
  */
object Sampling {

  /** 256-bucket hash of a key column ("00".."ff"). */
  def hashBucket(key: Column): Column =
    substring(md5(key.cast("string")), 1, 2)

  /** Keep rows whose bucket <= the (possibly per-row, e.g. per-stratum)
    * hex threshold.
    */
  def sample(df: DataFrame, key: Column, hexThreshold: Column): DataFrame =
    df.filter(hashBucket(key) <= hexThreshold)

  /** Train/test split flag: rows hash to the same side forever. */
  def isTest(key: Column, hexThreshold: String): Column =
    hashBucket(key) <= lit(hexThreshold)

  /** Per-group quota cap: keep at most `quota` rows per group, chosen
    * by hash order of the key (not arrival/id order, which would bias
    * the kept set toward whatever sorted first). This is the
    * domain-balancing step of corpus assembly — cap each domain's
    * contribution while keeping selection deterministic and
    * reproducible. One shuffle on the group key; within a group the
    * window is a top-k, never a full materialization, and heavy
    * domains can be pre-thinned with [[sample]] (nested thresholds
    * compose) before the window if a single group would overflow an
    * executor.
    */
  def quotaPerGroup(df: DataFrame, key: Column, groupCol: String,
      quota: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(groupCol)
      .orderBy(md5(key.cast("string")), key)
    df.withColumn("sample_rank", row_number().over(w).cast("long"))
      .filter(col("sample_rank") <= quota)
  }

  /** Mixture weighting: materialize per-domain epoch counts — the data
    * mixing step of corpus assembly (upsample high-quality domains,
    * downsample bulk ones; weights are usually tuned per source).
    * A weight is (base epochs, hex threshold for one extra epoch): a
    * row repeats `base` times, plus once more if its key hashes under
    * the threshold — so weight 2.1 means "2 epochs, and a
    * deterministic ~10% of rows get a 3rd". Base 0 downsamples (rows
    * not selected emit nothing).
    *
    * Repetition is `explode(sequence(...))` — map-side row
    * amplification at the point of consumption, no shuffle; and
    * because the fractional selection is [[hashBucket]]-based it is
    * reproducible and nests across weight changes.
    */
  def mixWeighted(df: DataFrame, key: Column, base: Column,
      extraHexThreshold: Column): DataFrame = {
    val repeats = (base +
      when(hashBucket(key) <= extraHexThreshold, 1).otherwise(0)).cast("int")
    // guard: Spark's sequence(1, 0) auto-reverses to [1, 0] instead of
    // returning empty, so 0-repeat rows must map to an empty array
    // explicitly (explode then drops them)
    df.withColumn("epoch",
        explode(when(repeats >= 1, sequence(lit(1), repeats))
          .otherwise(array().cast("array<int>"))))
      .withColumn("epoch", col("epoch").cast("long"))
  }

  /** Temperature-based mixture resampling — the multilingual
    * `p^alpha` re-weighting (XLM-R / mBERT style; public literature):
    * group `s` with corpus share `p_s` is resampled to share
    * `p_s^alpha / sum_t p_t^alpha`, flattening the distribution for
    * `alpha < 1` (rare groups repeat, dominant groups downsample)
    * while keeping the expected corpus size.
    *
    * Per-row repeat counts are the [[mixWeighted]] discipline:
    * deterministic integer base + md5-bucket fractional extras — no
    * RNG, reproducible, nested. Weights come from one tiny
    * (groups-sized) aggregate broadcast back; the normalizer `Z` is
    * folded over a group-sorted array (sequential HOF fold), so the
    * float sum is order-independent across partitionings and engines.
    * The rest is exact: integer counts, one `round(, 6)` snap of the
    * per-group rate, integer bucket threshold.
    */
  def mixTemperature(df: DataFrame, key: Column, groupCol: String,
      alpha: Double): DataFrame = {
    val cnt = df.groupBy(col(groupCol)).agg(count(lit(1)).as("_n"))
    val tot = cnt.agg(
      sum(col("_n")).as("_tot"),
      aggregate(
        // deliberately array_sort, NOT sort_array (the r19 sweep's
        // one exclusion, kept in r20): the struct ELEMENTS are never
        // null, but the _g FIELD is caller-controlled and the two
        // sorts place null fields differently — swapping could move
        // the null group in the fold order and shift the float sum
        // _Z for callers with null group keys. The array is
        // groups-sized (tiny, one per corpus), so the lambda
        // comparator costs nothing here; this sort exists for
        // order-determinism, not perf.
        array_sort(collect_list(struct(col(groupCol).as("_g"),
          pow(col("_n"), lit(alpha)).as("_p")))),
        lit(0.0), (acc, x) => acc + x.getField("_p")).as("_Z"))
    val w = cnt.crossJoin(broadcast(tot))
      .select(col(groupCol),
        round(col("_tot") * pow(col("_n"), lit(alpha)) /
          (col("_Z") * col("_n")), 6).as("_r"))
      .select(col(groupCol), floor(col("_r")).cast("int").as("_base"),
        floor((col("_r") - floor(col("_r"))) * 256).cast("int").as("_thr"))
    val bucket = conv(substring(md5(key.cast("string")), 1, 2), 16, 10)
      .cast("int")
    df.join(broadcast(w), Seq(groupCol))
      .withColumn("_reps",
        (col("_base") + when(bucket < col("_thr"), 1).otherwise(0)).cast("int"))
      .withColumn("epoch",
        explode(when(col("_reps") >= 1, sequence(lit(1), col("_reps")))
          .otherwise(array().cast("array<int>"))))
      .withColumn("epoch", col("epoch").cast("long"))
      .drop("_base", "_thr", "_reps")
  }

  /** Corpus curation under a token budget: keep the best-scoring
    * documents whose cumulative token count fits `budget` — the
    * pretraining-mix constraint (you don't take a FRACTION of a
    * source, you take the best documents that FIT the token budget).
    * Global order is (`scoreCol` desc, `idCol` asc) — a total order,
    * so the selected set and every `cum_tokens` value are exact and
    * deterministic.
    *
    * The global running total is a TWO-LEVEL prefix sum, never a
    * single-partition window (the orderBy-without-partitionBy window
    * every naive cumsum reaches for serializes the corpus through one
    * reducer): range-partition on the order key, per-partition local
    * cumsum (partition-local sort only), plus per-partition OFFSETS
    * from a driver-side running total of the per-partition sums
    * (`numPartitions` rows — metadata-sized, like the touched-
    * partition collect in MergeWriter). The materialization barrier is
    * required for correctness, not speed: partition ids must be THE
    * SAME rows in the totals pass and the cumsum pass, and a
    * recomputed range exchange does not guarantee identical boundaries.
    */
  def selectTokenBudget(df: DataFrame, idCol: String, scoreCol: String,
      tokenCol: String, budget: Long, partitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val n = if (partitions > 0) partitions
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val ranged = df.select(col(idCol), col(scoreCol), col(tokenCol))
      .repartitionByRange(n, col(scoreCol).desc, col(idCol))
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint()
    val totals = ranged.groupBy(col("_pid"))
      .agg(sum(col(tokenCol)).as("_t")).collect()
      .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets: Map[Int, Long] = {
      var acc = 0L
      totals.map { case (pid, t) => val o = (pid, acc); acc += t; o }.toMap
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_pid"))
      .orderBy(col(scoreCol).desc, col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    ranged
      .withColumn("cum_tokens",
        sum(col(tokenCol)).over(w) +
          element_at(typedlit(offsets), col("_pid")))
      .filter(col("cum_tokens") <= budget)
      .drop("_pid")
  }

  /** Deterministic global corpus shuffle into fixed-size training
    * shards — the last step before a pretraining run: every document
    * gets a pseudorandom but REPRODUCIBLE position (a pure function of
    * (seed, id) — stable across re-runs, engines and repartitioning,
    * like every sampler in this object), and positions pack into
    * shards of `docsPerShard` documents ((shard, pos_in_shard) tell a
    * data loader exactly where each document lands).
    *
    * The shuffle key is the md5-derived 60-bit integer of "seed|id"
    * (the [[sample]]/`sampleWeighted` idiom, so the DuckDB oracle
    * replays it bit-for-bit); the GLOBAL rank over (key, id) is the
    * same two-level prefix pattern as [[selectTokenBudget]] — range
    * partition on the key (hash keys are uniform, so ranges balance by
    * construction), partition-local row_number, driver offsets from
    * the `numPartitions`-row count table. No global sort through one
    * reducer, no single-partition window; the barrier pins partition
    * ids across the counts and rank passes.
    *
    * PRECONDITION: `idCol` must be unique (it is the document key).
    * Duplicate ids would share a shuffle key but receive distinct
    * positions, and [[writeShards]]'s join-back would then multiply
    * rows — dedup first (`dedup_exact` is the operator for that).
    */
  def shuffleShards(df: DataFrame, idCol: String, docsPerShard: Int,
      seed: String, partitions: Int = 0): DataFrame =
    shuffleShardsCounted(df, idCol, docsPerShard, seed, partitions)._1

  /** [[shuffleShards]] plus the total row count, which the rank's own
    * counts pass already computed on the driver — callers that need
    * |df| alongside the coordinates (the shard-append sink derives its
    * sealed-shard count from it) read it here for free instead of
    * paying a separate count() job per call/batch.
    */
  private[graft] def shuffleShardsCounted(df: DataFrame, idCol: String,
      docsPerShard: Int, seed: String, partitions: Int = 0):
      (DataFrame, Long) = {
    require(docsPerShard >= 1, "need a positive shard size")
    val key = conv(substring(md5(
        concat(lit(seed + "|"), col(idCol).cast("string"))), 1, 15), 16, 10)
      .cast("long")
    val (ranked, n) = globalRankUniformCounted(
      df.select(col(idCol)).withColumn("_k", key),
      "_k", col(idCol), partitions)
    (ranked.select(col(idCol), col("_k").as("shuffle_key"),
      floor(col("_pos") / docsPerShard).cast("long").as("shard"),
      pmod(col("_pos"), lit(docsPerShard.toLong)).as("pos_in_shard")), n)
  }

  /** The two-level distributed global rank both shard builders share
    * (and [[selectTokenBudget]] mirrors with a sum): range-partition
    * on the total order, partition-local row_number, driver offsets
    * from the per-partition counts. The localCheckpoint barrier is
    * correctness-critical — partition ids must be the SAME rows in the
    * counts pass and the rank pass, and a recomputed range exchange
    * does not guarantee identical boundaries. Emits `_pos` (0-based
    * global rank) alongside the input columns.
    */
  private def globalRank(df: DataFrame, order: Seq[Column],
      partitions: Int): DataFrame =
    globalRankCounted(df, order, partitions)._1

  /** The analytic-bucket variant of [[globalRankCounted]] for keys
    * UNIFORM in [0, 2^60) — the md5-derived 60-bit shuffle keys every
    * sampler in this object produces. Range boundaries of a uniform
    * key are known in closed form, so the bucket id is computed
    * map-side (`_k / width`) and the RangePartitioner SAMPLING PASS —
    * a whole extra job over the input that `repartitionByRange` runs
    * before the real shuffle — disappears. That job was pure per-call
    * fixed cost for the streaming shard sink, which pays this rank
    * once per micro-batch (VERDICT r19 #2's remaining floor).
    *
    * 4·width buckets hash-distribute into the `n` shuffle partitions
    * (more buckets than partitions smooths the hash-assignment
    * lumpiness); the window partitions by BUCKET and the driver
    * offsets accumulate in bucket order, so the emitted `_pos` is the
    * identical global (key, id) rank the range form produced —
    * bucket-ascending IS key-range-ascending. The localCheckpoint
    * keeps the counts pass and the rank pass on one materialization
    * (deterministic buckets would make a recompute CORRECT, unlike
    * nondeterministic sampled ranges, but it would still be a second
    * full compute).
    */
  private def globalRankUniformCounted(df: DataFrame, keyCol: String,
      idCol: Column, partitions: Int): (DataFrame, Long) = {
    val spark = df.sparkSession
    val n = if (partitions > 0) partitions
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val buckets = 4L * n
    val width = (1152921504606846976L + buckets - 1) / buckets // ceil(2^60/B)
    // TRUE integer division (`div`), not `/`: Spark's `/` is double
    // division, which rounds a 60-bit key through a 53-bit mantissa —
    // the composed double-then-cast mapping happened to stay monotone,
    // but the invariant was accidental (ADVICE r20). `div` is exact
    // floor division on longs, so bucket-ascending IS key-ascending by
    // arithmetic, not by luck. A NULL key (null id upstream) maps to
    // bucket -1, mirroring the range form's NULLS FIRST placement —
    // the window's ascending order also puts nulls first, so null-key
    // rows take the lowest global ranks instead of NPE-ing the counts
    // pass.
    val bucketed = df
      .withColumn("_bk",
        when(col(keyCol).isNull, lit(-1))
          .otherwise(expr(s"$keyCol div ${width}L").cast("int")))
      .repartition(n, col("_bk"))
      .localCheckpoint()
    val counts = bucketed.groupBy(col("_bk"))
      .agg(count(lit(1)).as("_c")).collect()
      .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets: Map[Int, Long] = {
      var acc = 0L
      counts.map { case (bk, c) => val o = (bk, acc); acc += c; o }.toMap
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_bk")).orderBy(col(keyCol), idCol)
    (bucketed
      .withColumn("_pos",
        row_number().over(w).cast("long") +
          element_at(typedlit(offsets), col("_bk")) - 1L)
      .drop("_bk"), counts.map(_._2).sum)
  }

  /** [[globalRank]] returning the total row count too — the counts
    * pass collects it to the driver anyway (Σ per-partition counts);
    * exposing it saves callers a separate count() job over the input.
    */
  private def globalRankCounted(df: DataFrame, order: Seq[Column],
      partitions: Int): (DataFrame, Long) = {
    val spark = df.sparkSession
    val n = if (partitions > 0) partitions
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val ranged = df
      .repartitionByRange(n, order: _*)
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint()
    val counts = ranged.groupBy(col("_pid"))
      .agg(count(lit(1)).as("_c")).collect()
      .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets: Map[Int, Long] = {
      var acc = 0L
      counts.map { case (pid, c) => val o = (pid, acc); acc += c; o }.toMap
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_pid")).orderBy(order: _*)
    (ranged
      .withColumn("_pos",
        row_number().over(w).cast("long") +
          element_at(typedlit(offsets), col("_pid")) - 1L)
      .drop("_pid"), counts.map(_._2).sum)
  }

  /** Mixture-weighted deterministic corpus order → training shards:
    * like [[shuffleShards]], but each document races with an
    * EXPONENTIAL key `ln(u)/w` (u = md5-uniform in (0,1], w =
    * `weightCol` > 0) — the weighted-sampling-without-replacement
    * trick `sampleQuota`/`sampleWeighted` already use, applied to the
    * WHOLE corpus order: every prefix of the resulting order is a
    * weighted sample, so a data loader walking shards front-to-back
    * consumes sources in proportion to their weights from step one
    * (the pretraining mixture schedule, not just a mixture total).
    * Same two-level global rank, same reproducibility story, same
    * id-uniqueness precondition as [[shuffleShards]]; weights must be
    * strictly positive (ln(u) < 0 — a zero/negative weight would
    * flip or degenerate the race instead of failing loudly).
    */
  def mixtureShards(df: DataFrame, idCol: String, weightCol: String,
      docsPerShard: Int, seed: String, partitions: Int = 0): DataFrame = {
    require(docsPerShard >= 1, "need a positive shard size")
    val h = conv(substring(md5(
        concat(lit(seed + "|"), col(idCol).cast("string"))), 1, 15), 16, 10)
      .cast("double")
    val u = (h + 1.0) / lit(1.152921504606847e18) // (0, 1], 2^60 scale
    // fail LOUDLY on a non-positive weight: ln(u)/0 is ±Infinity/NaN
    // and a negative weight flips the race — silent order corruption
    val key = when(col(weightCol) > 0, log(u) / col(weightCol))
      .otherwise(raise_error(concat(
        lit("mixtureShards: non-positive weight for id "),
        col(idCol).cast("string"))))
    // weightCol is consumed by the key expression BEFORE the range
    // shuffle — only (id, _k) travel through the exchange/checkpoint
    globalRank(df.select(col(idCol), key.as("_k")),
        Seq(col("_k").desc, col(idCol)), partitions)
      .select(col(idCol), round(col("_k"), 6).as("mix_key"),
        floor(col("_pos") / docsPerShard).cast("long").as("shard"),
        pmod(col("_pos"), lit(docsPerShard.toLong)).as("pos_in_shard"))
  }

  /** Materialize a shuffled corpus as on-disk training shards: one
    * parquet file per `shard=N` directory, rows inside each file in
    * `pos_in_shard` order — the layout a pretraining data loader
    * streams sequentially (shard dirs shard-parallel across loader
    * workers, in-file order IS the sample order). [[shuffleShards]]
    * supplies the deterministic coordinates; the write repartitions on
    * the shard id (each shard = one task = one file, shards are
    * equal-sized by construction so the write is skew-free) and
    * sortWithinPartitions pins the in-file row order.
    *
    * `shard` and `pos_in_shard` are RESERVED names — they become the
    * loader-facing coordinate columns of the written layout (`shard`
    * the directory key, `pos_in_shard` stored per row), so the input
    * must not already use them (nor the internal `shuffle_key`,
    * which is dropped before the write — the hash key is a shuffle
    * implementation detail, not part of the shard schema). Enforced
    * loudly: the coords join-back would otherwise produce ambiguous
    * columns or silently multiply rows.
    */
  def writeShards(df: DataFrame, idCol: String, dir: String,
      docsPerShard: Int, seed: String, partitions: Int = 0): Unit = {
    val reserved = Set("shard", "pos_in_shard", "shuffle_key")
    val clash = df.columns.filter(reserved)
    require(clash.isEmpty,
      s"writeShards reserves column name(s) ${clash.mkString(", ")} " +
        "for the shard layout — rename them in the input")
    val coords = shuffleShards(df, idCol, docsPerShard, seed, partitions)
    df.join(coords.drop("shuffle_key"), idCol)
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("pos_in_shard"))
      .write.mode("overwrite").partitionBy("shard").parquet(dir)
  }
}
