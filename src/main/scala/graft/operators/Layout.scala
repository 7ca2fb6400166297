package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
}
