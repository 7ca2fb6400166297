package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Daily per-key aggregate mart — the reference's `dwh` layer
  * (`/root/reference/dbt/models/dwh/dw_daily_airport_metrics.sql:7-37`):
  * `date_trunc('day', observed)` + GROUP BY (key, day) computing
  * AVG / MAX / MIN / COUNT(*), plus a `concat(key,'_',yyyyMMdd)`
  * surrogate key (`:22`).
  *
  * Pure hash aggregation with map-side combine; the group-by key
  * includes the day so the shuffle carries one row per (key, day) per
  * map partition — at 100 TB this is the minimal-shuffle plan. The
  * surrogate key is derived *after* aggregation (20 rows/day in the
  * reference; |keys|x|days| rows generally), never on the raw rows.
  */
object DailyRollup {

  /** @param metrics aggregate columns, already aliased. */
  def apply(df: DataFrame, key: String, tsCol: String, metrics: Seq[Column]): DataFrame =
    df.groupBy(col(key), to_date(date_trunc("day", col(tsCol))).as("day"))
      .agg(metrics.head, metrics.tail: _*)
      .withColumn(
        s"${key}_date",
        concat(col(key).cast("string"), lit("_"), date_format(col("day"), "yyyyMMdd")))
}
