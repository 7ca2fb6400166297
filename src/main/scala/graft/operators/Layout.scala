package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical data-layout optimization: write a table z-ordered on a set
  * of quantized dimensions so multi-dimensional predicates skip files.
  *
  * Shape: ONE range-partitioning shuffle on the z-index (sampled range
  * bounds → files tile the curve into disjoint z-intervals), an
  * in-partition sort, and a plain parquet write. No collect, no
  * global sort — `repartitionByRange` scales to any file count, and
  * the per-file footer min/max of every indexed dimension is what a
  * 100 TB scan prunes on.
  */
object Layout {

  /** Write `df` z-ordered by `z` into `numFiles` range-partitioned
    * parquet files at `path`. The z column is kept in the output
    * (name `_z`) — it is the file-pruning handle and costs 8 bytes.
    */
  def zorderWrite(df: DataFrame, z: Column, numFiles: Int, path: String): Unit =
    df.withColumn("_z", z)
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .write.mode("overwrite").parquet(path)

  /** Build the per-file min/max stats index of `cols` for the parquet
    * table at `path` — the skipping metadata a lakehouse keeps in its
    * manifest. One scan pruned to the indexed columns, partial min/max
    * per file before the (#files)-row shuffle; the index is file-count
    * sized, not data sized. Persist it with [[writeStatsIndex]] and
    * maintenance re-runs only when files change.
    */
  def statsIndex(spark: SparkSession, path: String, cols: Seq[String]): DataFrame =
    fileStats(spark.read.parquet(path), cols)

  /** Per-file stats of an already-opened scan — the one definition of
    * the index schema (statsIndex and refreshStatsIndex both fold
    * through here, so they cannot drift).
    */
  private def fileStats(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))) :+
      count(lit(1)).as("n_rows")
    df.select(col("_metadata.file_path").as("file") +: cols.map(col): _*)
      .groupBy(col("file"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Persist the stats index next to the table (sibling `<path>_stats`
    * dir — parquet dirs cannot hold a second dataset).
    */
  def writeStatsIndex(spark: SparkSession, path: String, cols: Seq[String]): Unit =
    statsIndex(spark, path, cols).repartition(1)
      .write.mode("overwrite").parquet(path + "_stats")

  /** Incrementally refresh the persisted index after appends/compaction:
    * stats are computed ONLY for files not yet indexed (scan cost is
    * proportional to new data, the append-heavy maintenance shape),
    * entries for vanished files drop, untouched entries carry over
    * byte-for-byte. A crash mid-refresh leaves the old index (swap via
    * [[MergeWriter.replace]]), which is safe: the index admits false
    * positives but a STALE-MISSING file would be a false negative, so
    * readers must refresh after writes they depend on.
    */
  def refreshStatsIndex(spark: SparkSession, path: String, cols: Seq[String]): Unit = {
    val idxPath = path + "_stats"
    if (!MergeWriter.exists(spark, idxPath)) { writeStatsIndex(spark, path, cols); return }
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // scheme renderings differ between the listing (file:/x) and
    // Spark's _metadata.file_path (file:///x): compare on the
    // scheme-free path component
    def norm(s: String) = new org.apache.hadoop.fs.Path(s).toUri.getPath
    // RECURSIVE file listing: on a Hive-partitioned layout the
    // top-level entries are `col=value` DIRECTORIES (no .parquet
    // suffix) — a flat listStatus would see zero current files, drop
    // every index entry, and commit an EMPTY index that prunedRead
    // would then silently read as "no overlapping files"
    val current = {
      // skip hidden path components (swap staging `.X.old` /
      // `.X.tmp-*`, metadata `_` dirs): listFiles does NOT filter them
      // the way partition discovery does, and indexing a crash
      // leftover would make prunedRead read a partition's rows twice
      val rootPath = norm(p.toString)
      def hiddenComponent(f: org.apache.hadoop.fs.Path): Boolean = {
        val rel = norm(f.toString).stripPrefix(rootPath)
        rel.split('/').exists(c =>
          c.startsWith(".") || c.startsWith("_"))
      }
      val it = fs.listFiles(p, true)
      val out = scala.collection.mutable.ArrayBuffer[String]()
      while (it.hasNext) {
        val s = it.next()
        if (s.getPath.getName.endsWith(".parquet") &&
            !hiddenComponent(s.getPath))
          out += s.getPath.toUri.toString
      }
      out.toArray
    }
    val currentNorm = current.map(norm).toSet
    spark.catalog.refreshByPath(idxPath)
    val allOld = spark.read.parquet(idxPath)
    val keep = allOld.select("file").collect().map(_.getString(0))
      .filter(f => currentNorm.contains(norm(f)))
    val old = allOld.filter(col("file").isInCollection(keep.toSeq))
      .localCheckpoint()
    val knownNorm = keep.map(norm).toSet
    val fresh = current.filterNot(f => knownNorm.contains(norm(f))).toSeq.sorted
    val merged =
      if (fresh.isEmpty) old
      // basePath keeps partition columns resolvable when the fresh
      // files are leaves of a hive layout (a bare leaf-file read has
      // no `col=value` context and an index over a partition column
      // would fail UNRESOLVED_COLUMN on refresh)
      else old.unionByName(fileStats(
        spark.read.option("basePath", path).parquet(fresh: _*), cols))
    MergeWriter.replace(spark, idxPath, merged.repartition(1))
  }

  /** Read `path` scanning ONLY files whose [min,max] envelope overlaps
    * every `(col, lo, hi)` bound, using the persisted stats index; the
    * residual predicate still applies (file stats admit false
    * positives, never false negatives). The driver-side file list is
    * index-sized metadata — the same listing a format like Delta/Iceberg
    * resolves before planning. Combined with [[zorderWrite]], a k-dim
    * range predicate prunes to the few files tiling the matching curve
    * segment ([[LayoutSpec]] asserts the actual skip counts).
    */
  def prunedRead(spark: SparkSession, path: String,
      bounds: Seq[(String, Long, Long)]): DataFrame = {
    val idx = spark.read.parquet(path + "_stats")
    val overlap = bounds.map { case (c, lo, hi) =>
      col(s"max_$c") >= lo && col(s"min_$c") <= hi
    }.reduce(_ && _)
    val files = idx.filter(overlap).select("file")
      .collect().map(_.getString(0))
    val residual = bounds.map { case (c, lo, hi) =>
      col(c) >= lo && col(c) <= hi
    }.reduce(_ && _)
    val base =
      if (files.isEmpty) spark.read.parquet(path).limit(0)
      else spark.read.parquet(files: _*)
    base.filter(residual)
  }
}
