package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Portable Count-Min sketch as plain DataFrame aggregation — the
  * frequency-estimation companion to [[Hll]] (cardinality): point
  * lookups of item counts from O(d·w) state instead of O(|distinct|).
  *
  * Same portability trick as [[Hll]]: the d row-hashes are md5 over a
  * salted key (`"i:value"`), the bucket is the first two hex nibbles
  * (w = 256), and every counter is an exact BIGINT count — no floating
  * point anywhere, so any engine with md5 reproduces the sketch and
  * its estimates exactly (the DuckDB oracle does).
  *
  * Scale shape: building is one map-side-combining count over (row,
  * bucket) — the exchange carries at most d·w = 1024 rows regardless
  * of input size. Estimation broadcasts the sketch (≤ 1024 rows) to
  * the probe side; `min` over the d per-row counters gives the classic
  * CM upper bound: est ≥ true, est ≤ true + ε·N with prob 1-δ.
  */
object CountMin {

  private val W_NIBBLES = 2 // bucket = first 2 hex nibbles → w = 256

  // concat (not concat_ws): null keys must hash to null, matching the
  // oracle's null-propagating `||`
  private def bucket(salt: Column, v: Column): Column =
    conv(substring(md5(concat(salt.cast("string"), lit(":"), v)), 1, W_NIBBLES),
      16, 10).cast("int")

  /** Build the sketch over `valueCol`: one row per (row-index, bucket)
    * with its exact count. Nulls are ignored.
    */
  def sketch(df: DataFrame, valueCol: String, d: Int = 4): DataFrame =
    df.filter(col(valueCol).isNotNull)
      .select(explode(sequence(lit(0), lit(d - 1))).as("_i"),
        col(valueCol).cast("string").as("_v"))
      .select(col("_i"), bucket(col("_i"), col("_v")).as("_b"))
      .groupBy(col("_i"), col("_b"))
      .agg(count(lit(1)).as("cnt"))

  /** Point-estimate the count of each distinct value in `probes`
    * (column `valueCol`) from a sketch built with the same `d`:
    * min over the d row counters, 0 when a bucket was never touched.
    */
  def estimate(sk: DataFrame, probes: DataFrame, valueCol: String,
      outName: String, d: Int = 4): DataFrame =
    probes
      .select(col(valueCol), col(valueCol).cast("string").as("_v"),
        explode(sequence(lit(0), lit(d - 1))).as("_i"))
      .select(col(valueCol), col("_i"), bucket(col("_i"), col("_v")).as("_b"))
      .join(broadcast(sk), Seq("_i", "_b"), "left")
      .groupBy(col(valueCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as(outName))
}
