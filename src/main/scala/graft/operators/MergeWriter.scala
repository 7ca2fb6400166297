package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Keyed merge (upsert) and append materializations on Parquet — the
  * reference's sink surface:
  *
  *  - K2: `INSERT ... ON CONFLICT (id) DO UPDATE`
  *    (`/root/reference/src/etl/mongo_to_postgres.py:89-112`)
  *  - K4/K6/K7: dbt `incremental` merge on `unique_key`
  *    (`stg_metar_observations.sql:1-7`, `int_metar_latest.sql:1-7`,
  *    `dw_daily_airport_metrics.sql:1-5`)
  *  - K5: incremental append with `on_schema_change='append_new_columns'`
  *    (`ods_metar_latest.sql:1-7`)
  *
  * With no transactional table format in the environment, merge is
  * union + keep-latest-per-key ([[LatestPerKey]], i.e. a `max_by`
  * aggregation — no sort) followed by write-temp-then-swap, which makes
  * re-runs idempotent (the reference's own guarantee level: replayed
  * batches collapse onto the same keys). Updates win over existing rows
  * at equal version via a source-precedence tie-break column.
  *
  * Scale note: this is a full-table rewrite per merge, correct but
  * O(|target|). The production-scale variant partitions the target by a
  * date column and rewrites only partitions containing updated keys —
  * see [[upsertPartitioned]]; at 100 TB with time-keyed updates that
  * touches only the recent tail.
  */
object MergeWriter {

  /** Loud ceiling on every driver-side partition-value collect: the
    * values are metadata (one per touched partition — calendar days,
    * shard ids), bounded by |partitions| and NEVER by row count. A
    * merge that would collect more has been handed a per-row column as
    * its partition key; failing fast beats a silent driver OOM at
    * scale. 100k values ≈ 274 years of days — far above any sane
    * layout, far below driver heap.
    */
  val MaxCollectedPartitionValues: Int = 100000

  /** The guarded collect behind every touched-partition rescope: the
    * distinct `partCol` values of `df`, failing loudly past `max`
    * (spec-gated in MergeWriterSpec with a small cap).
    */
  private[graft] def boundedPartitionValues(df: DataFrame, partCol: String,
      max: Int = MaxCollectedPartitionValues): Seq[Any] = {
    // limit(max+1) bounds the DRIVER side of a mis-keyed call before
    // the guard fires — the collect itself must never be the OOM
    val vals = df.select(partCol).distinct().limit(max + 1)
      .collect().map(_.get(0)).toSeq
    require(vals.size <= max,
      s"partitioned merge on '$partCol' collected more than $max distinct " +
        s"partition values: '$partCol' is not partition-grained — wrong " +
        "partition column?")
    vals
  }

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  def exists(spark: SparkSession, dir: String): Boolean =
    fs(spark, new Path(dir)).exists(new Path(dir))

  /** The max DAY partition of a hive-layout table, from the DIRECTORY
    * LISTING alone — no data file is opened. For a `day=to_date(ts)`
    * layout this names the partition holding max(ts), so a high-
    * watermark read scans one partition instead of the table. Values
    * compare as raw dir strings, which is only correct for fixed-width
    * ISO dates — every non-null value is VALIDATED against the
    * `yyyy-MM-dd` shape and anything else fails loud (an
    * integer-valued partition column would otherwise silently return
    * '9' > '10'). The null partition (`__HIVE_DEFAULT_PARTITION__`)
    * is ignored — a null partition value never carries the max of a
    * ts-derived column. None when the table is missing or has no
    * partition dirs.
    */
  def maxDayPartition(spark: SparkSession, dir: String,
      partCol: String): Option[String] = {
    val p = new Path(dir)
    val f = fs(spark, p)
    if (!f.exists(p)) None
    else {
      val vals = f.listStatus(p).toSeq
        .filter(s =>
          s.isDirectory && s.getPath.getName.startsWith(partCol + "="))
        .map(_.getPath.getName.substring(partCol.length + 1))
        .filterNot(_ == "__HIVE_DEFAULT_PARTITION__")
      vals.find(!_.matches("""\d{4}-\d{2}-\d{2}""")).foreach { v =>
        throw new IllegalStateException(
          s"maxDayPartition($dir, $partCol): partition value '$v' is not " +
            "an ISO date — lexicographic max is only a value max for " +
            "fixed-width yyyy-MM-dd partitions")
      }
      vals.maxOption
    }
  }

  /** Merge `updates` into the parquet table at `dir`, keyed by `keys`,
    * newest row per key winning by `versionCols` (updates beat existing
    * rows on ties).
    */
  def upsert(spark: SparkSession, dir: String, updates: DataFrame,
      keys: Seq[String], versionCols: Seq[String]): Unit = {
    spark.catalog.refreshByPath(dir) // manual swaps bypass listing-cache invalidation
    // updates are reduced to latest-per-key even on first write: a batch
    // may itself carry several versions of a key (property-tested)
    val incoming = updates.withColumn("_src", lit(1))
    val unioned =
      if (!exists(spark, dir)) incoming
      else spark.read.parquet(dir).withColumn("_src", lit(0))
        .unionByName(incoming, allowMissingColumns = true)
    val merged = LatestPerKey(unioned, keys, versionCols :+ "_src").drop("_src")
    swapWrite(spark, dir, merged)
  }

  /** K5: append-only with schema widening (new columns null-filled on
    * old rows at read time via mergeSchema).
    */
  def append(spark: SparkSession, dir: String, df: DataFrame): Unit =
    df.write.mode("append").parquet(dir)

  /** Partition-pruned merge: only partitions (by `partCol`, e.g. a date
    * column) present in `updates` are read, merged and rewritten;
    * untouched history is never read or written — their files stay
    * byte-identical (spec-asserted).
    *
    * The merged rows are written ONCE to a temp layout partitioned by
    * `partCol`, then each touched `partCol=x` directory is swapped into
    * the target with the crash-recoverable rename dance of
    * [[swapWrite]]. No dynamic-partition-overwrite second write, no
    * session-wide conf mutation.
    */
  /** @param filesPerPartition write fan-out per partition dir. The
    *        default (1) co-locates each `partCol` value into ONE task
    *        and one file — right for day-sized partitions. At 100 TB a
    *        HOT day is bigger than any single task should be: raise it
    *        and each partition's rows spread over `filesPerPartition`
    *        tasks/files, salted by the merge keys (key-disjoint, so
    *        latest-per-key is unaffected).
    */
  def upsertPartitioned(spark: SparkSession, dir: String, updates: DataFrame,
      keys: Seq[String], versionCols: Seq[String], partCol: String,
      filesPerPartition: Int = 1): Unit = {
    spark.catalog.refreshByPath(dir)
    val fresh = !exists(spark, dir)
    // the non-fresh path reads `updates` twice (touched-partition values,
    // then the merge itself) — materialize the batch once so an expensive
    // upstream plan (at 100 TB: a filtered source scan) runs once, not
    // twice; localCheckpoint spills per-partition blocks, no driver heap
    val inc0 = if (fresh) updates else updates.localCheckpoint()
    val incoming = inc0.withColumn("_src", lit(1))
    // driver-side touched-partition values (bounded by |partitions|,
    // metadata-sized): an isin filter partition-PRUNES the target
    // scan — only touched dirs are listed into the plan, no join,
    // no exchange (vs a broadcast semi join, which still scans the
    // full partition listing through the probe side)
    val touched =
      if (fresh) None
      else Some(boundedPartitionValues(inc0, partCol))
    // an empty update set touches no partitions: the merge is a true
    // no-op (no empty temp write, no swap loop, no listing refresh) —
    // the cheap idle path an incremental pipeline replays constantly
    if (touched.exists(_.isEmpty)) return
    val unioned = touched match {
      case None => incoming
      case Some(vals) =>
        // a NULL partition value needs its own predicate: isInCollection
        // evaluates to NULL (never true) against null rows, so a batch
        // touching the null partition would stage a fresh
        // __HIVE_DEFAULT_PARTITION__ dir WITHOUT the target's existing
        // null-partition rows — and the swap below would then silently
        // drop them
        val nonNull = vals.filter(_ != null)
        val pred =
          if (nonNull.size == vals.size) col(partCol).isInCollection(nonNull)
          else if (nonNull.isEmpty) col(partCol).isNull
          else col(partCol).isInCollection(nonNull) || col(partCol).isNull
        val target = spark.read.parquet(dir)
        // a target written WITHOUT the partition layout (a legacy
        // unpartitioned table handed to the partitioned merge) must
        // fail with the actual problem, not an unresolved-column error
        // downstream — and never be partition-swapped into corruption
        require(target.columns.contains(partCol),
          s"partitioned merge target $dir has no '$partCol' column: " +
            "written unpartitioned? Rewrite the layout before merging " +
            "partitioned (one-time full rewrite via partitionBy).")
        target
          .filter(pred)
          .withColumn("_src", lit(0))
          .unionByName(incoming, allowMissingColumns = true)
    }
    // co-locate each partition's rows before the partitionBy write (32
    // shuffle partitions x |days| would otherwise write a small-file
    // storm); > 1 file per dir only when the caller asks for hot-
    // partition fan-out
    val merged0 = LatestPerKey(unioned, keys, versionCols :+ "_src").drop("_src")
    val merged =
      if (filesPerPartition <= 1) merged0.repartition(col(partCol))
      else {
        // explicit partition count: an expression-only repartition lets
        // AQE coalesce small outputs back into one task, silently
        // undoing the fan-out. Pinned to touched-dirs × fan-out (fresh
        // bulk loads fall back to the session shuffle setting).
        val n = touched.map(_.size * filesPerPartition)
          .getOrElse(ShuffleWidth.session(spark).toInt)
          .max(filesPerPartition)
        merged0.repartition(n, col(partCol),
          pmod(hash(keys.map(col): _*), lit(filesPerPartition)))
      }
    if (fresh) {
      // a fresh EMPTY write would leave a schema-less dir (partitionBy
      // with zero rows emits only _SUCCESS, no data files, unlike the
      // unpartitioned empty write) — every later read/merge would then
      // fail on an unreadable "existing" table. The emptiness check is
      // AFTER the write (was a pre-write `merged.isEmpty`, which
      // re-computed the entire merge subtree — full scan + shuffle +
      // aggregation — once for the probe and once for the write, a
      // whole duplicated job on every fresh partitioned bulk load):
      // partitionBy writes a `partCol=` dir per value, so zero
      // partition dirs ⇔ zero rows, and the schema-less husk is
      // deleted, leaving the same missing-dir state the no-write gave.
      merged.write.mode("overwrite").partitionBy(partCol).parquet(dir)
      val dst = new Path(dir)
      val f = fs(spark, dst)
      val wroteData = f.listStatus(dst)
        .exists(s => s.isDirectory && s.getPath.getName.startsWith(partCol + "="))
      if (!wroteData) { f.delete(dst, true); return }
    } else {
      val tmp = new Path(dir + ".merge.tmp-" +
        java.util.UUID.randomUUID().toString.take(8))
      val f = fs(spark, tmp)
      merged.write.mode("overwrite").partitionBy(partCol).parquet(tmp.toString)
      val parts = f.listStatus(tmp)
        .filter(s => s.isDirectory && s.getPath.getName.startsWith(partCol + "="))
      parts.foreach { s =>
        swapDir(f, s.getPath, new Path(dir, s.getPath.getName))
      }
      f.delete(tmp, true)
    }
    spark.catalog.refreshByPath(dir)
  }

  /** Small-file compaction: rewrite the parquet table at `dir` into
    * ~`targetFileBytes`-sized files (same crash-recoverable swap as
    * every merge). Streaming merge sinks and frequent small upserts
    * accumulate files far below the scan-efficient size; at 100 TB the
    * resulting per-file open/footer overhead and tiny row groups
    * dominate scan cost, so compaction is a first-class maintenance
    * op, run off the write path. File count derives from the CURRENT
    * on-disk byte size, so repeated compactions are stable.
    *
    * Hive-partitioned layouts ([[upsertPartitioned]] targets) are
    * detected via `col=value` subdirectories — at ANY nesting depth
    * (`a=1/b=2/...`) — and compacted per LEAF partition dir,
    * preserving the full layout. A flat rewrite of such a dir would
    * leave full-table files next to partition dirs (duplicating rows
    * on a later partition swap); a one-level rewrite of a multi-level
    * layout would fold the inner partition columns into the data
    * files and destroy the nested directory structure.
    */
  def compact(spark: SparkSession, dir: String,
      targetFileBytes: Long = 128L * 1024 * 1024): Unit = {
    val dst = new Path(dir)
    val f = fs(spark, dst)
    def leaves(p: Path): Seq[Path] = {
      val parts = f.listStatus(p).toSeq.filter { s =>
        val n = s.getPath.getName
        s.isDirectory && n.contains("=") && !n.startsWith("_") && !n.startsWith(".")
      }
      if (parts.isEmpty) Seq(p) else parts.flatMap(s => leaves(s.getPath))
    }
    val targets = leaves(dst)
    if (targets == Seq(dst))
      compactFlat(spark, dst, targetFileBytes, hiddenStaging = false)
    else targets.foreach(p => compactFlat(spark, p, targetFileBytes,
      hiddenStaging = true))
  }

  /** `hiddenStaging` stages the rewrite under a dot-prefixed sibling
    * (ignored by partition discovery) — REQUIRED when `dst` is a
    * partition dir inside a table root, where a visible `<name>.tmp-*`
    * sibling would be listed as a bogus partition and double rows for
    * concurrent readers.
    */
  private def compactFlat(spark: SparkSession, dst: Path,
      targetFileBytes: Long, hiddenStaging: Boolean): Unit = {
    val bytes = fs(spark, dst).getContentSummary(dst).getLength
    val n = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
    val df = spark.read.parquet(dst.toString).repartition(n)
    if (!hiddenStaging) swapWrite(spark, dst.toString, df)
    else {
      val tmp = new Path(dst.getParent, "." + dst.getName + ".tmp-" +
        java.util.UUID.randomUUID().toString.take(8))
      val f = fs(spark, dst)
      df.write.mode("overwrite").parquet(tmp.toString)
      swapDir(f, tmp, dst)
      spark.catalog.refreshByPath(dst.toString)
    }
  }

  /** Atomically replace the table at `dir` with `df` (crash-recoverable
    * swap; see [[swapDir]]) — the persistence primitive behind upsert
    * and the view-maintenance sinks ([[Ivm]]). An optional
    * `(fileName, content)` marker is written INTO the staged dir
    * before the swap, so marker and data commit in the same rename —
    * the hook replay-idempotent sinks use to record the batch they
    * applied (name it `_`/`.`-prefixed so scans ignore it).
    */
  def replace(spark: SparkSession, dir: String, df: DataFrame,
      marker: Option[(String, String)] = None): Unit = {
    val tmp = new Path(dir + ".tmp-" + java.util.UUID.randomUUID().toString.take(8))
    val dst = new Path(dir)
    val f = fs(spark, dst)
    df.write.mode("overwrite").parquet(tmp.toString)
    marker.foreach { case (name, content) =>
      val out = f.create(new Path(tmp, name), true)
      try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    }
    swapDir(f, tmp, dst)
    spark.catalog.refreshByPath(dir)
  }

  /** Materialize `df` then replace `dir` with it. */
  private def swapWrite(spark: SparkSession, dir: String, df: DataFrame): Unit =
    replace(spark, dir, df)

  /** Crash-recoverable directory replace: the previous content is
    * renamed to `.<dst>.old` before the new content renames in, so a
    * crash between the two renames leaves a recoverable copy at a
    * well-known name (never a silently lost table); the old copy is
    * dropped only after the new content is in place. The dot prefix
    * keeps a crash leftover INVISIBLE to partition discovery when the
    * swapped dir is a `col=value` partition inside a table root — a
    * visible `<name>.old` sibling would read as a bogus extra
    * partition and duplicate that partition's rows on every scan.
    */
  private[operators] def swapDir(f: org.apache.hadoop.fs.FileSystem,
      src: Path, dst: Path): Unit = {
    val old = new Path(dst.getParent, "." + dst.getName + ".old")
    f.delete(old, true) // leftover from a previous crashed swap
    if (f.exists(dst) && !f.rename(dst, old))
      throw new java.io.IOException(s"merge swap failed: $dst -> $old")
    if (!f.rename(src, dst))
      throw new java.io.IOException(s"merge swap failed: $src -> $dst")
    f.delete(old, true)
  }
}
