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

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  def exists(spark: SparkSession, dir: String): Boolean =
    fs(spark, new Path(dir)).exists(new Path(dir))

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
    * column) present in `updates` are rewritten; untouched history is
    * never read or written.
    */
  def upsertPartitioned(spark: SparkSession, dir: String, updates: DataFrame,
      keys: Seq[String], versionCols: Seq[String], partCol: String): Unit = {
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    spark.catalog.refreshByPath(dir)
    val incoming = updates.withColumn("_src", lit(1))
    val unioned =
      if (!exists(spark, dir)) incoming
      else {
        val touched = updates.select(partCol).distinct()
        spark.read.parquet(dir)
          .join(broadcast(touched), Seq(partCol), "left_semi")
          .withColumn("_src", lit(0))
          .unionByName(incoming, allowMissingColumns = true)
      }
    // one file per partition dir: co-locate each partition's rows before
    // the partitionBy write (32 shuffle partitions x |days| would
    // otherwise write a small-file storm, twice)
    val merged = LatestPerKey(unioned, keys, versionCols :+ "_src").drop("_src")
      .repartition(col(partCol))
    if (!exists(spark, dir)) {
      // fresh target: no read-write conflict, write directly
      merged.write.mode("overwrite").partitionBy(partCol).parquet(dir)
    } else {
      // materialize to a temp dir to break lineage on the target, then
      // dynamic-overwrite only the touched partitions
      merged.write.mode("overwrite").partitionBy(partCol).parquet(dir + ".merge.tmp")
      spark.read.parquet(dir + ".merge.tmp").write
        .mode("overwrite").partitionBy(partCol).parquet(dir)
      fs(spark, new Path(dir + ".merge.tmp")).delete(new Path(dir + ".merge.tmp"), true)
    }
    spark.catalog.refreshByPath(dir)
  }

  /** Materialize `df` then atomically-ish replace `dir` with it
    * (write temp → delete old → rename). Safe against the
    * read-then-overwrite-same-path trap; idempotent on re-run.
    */
  private def swapWrite(spark: SparkSession, dir: String, df: DataFrame): Unit = {
    val tmp = new Path(dir + ".tmp-" + java.util.UUID.randomUUID().toString.take(8))
    val dst = new Path(dir)
    val f = fs(spark, dst)
    df.write.mode("overwrite").parquet(tmp.toString)
    if (f.exists(dst)) f.delete(dst, true)
    if (!f.rename(tmp, dst))
      throw new java.io.IOException(s"merge swap failed: $tmp -> $dst")
    spark.catalog.refreshByPath(dir)
  }
}
