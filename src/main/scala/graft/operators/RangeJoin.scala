package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-range (interval) join: pair left rows with right rows of the
  * same key whose timestamps lie within ±`toleranceSeconds` — the
  * "events near events" operator Spark has no native physical join
  * for. A naive formulation (`a.ts BETWEEN b.ts - t AND b.ts + t`)
  * plans as a nested-loop join — quadratic per key and a
  * cluster-killer at 100 TB.
  *
  * Implemented instead as a binned equi-join: both sides are bucketed
  * into tolerance-width time bins, the left side explodes to its bin
  * and both neighbors (each right row lands in exactly one bin, and
  * any in-range partner is in bin±1), the join runs as a plain
  * shuffle/broadcast HASH join on (key, bin), and the exact range
  * predicate filters the candidates. Cost: 3x left rows through an
  * equi-join instead of |L|x|R| comparisons per key.
  */
object RangeJoin {

  /** @param left/right must share `keys`; timestamps compared via
    *                   `unix_micros`.
    */
  def within(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, toleranceSeconds: Long): DataFrame = {
    val tolUs = toleranceSeconds * 1000000L
    def bin(ts: Column): Column = floor(unix_micros(ts) / lit(tolUs))

    val l = left.withColumn("_bin",
      explode(array(bin(col(leftTs)) - 1, bin(col(leftTs)), bin(col(leftTs)) + 1)))
    val r = right.withColumn("_bin", bin(col(rightTs)))
    l.join(r, keys :+ "_bin")
      .filter(abs(unix_micros(col(leftTs)) - unix_micros(col(rightTs))) <= tolUs)
      .drop("_bin")
  }
}
