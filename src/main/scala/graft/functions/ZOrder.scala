package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve indexing — the data-layout primitive behind
  * multi-dimensional file clustering: rows close on the curve are
  * close in EVERY indexed dimension, so range-partitioning files by
  * z-index gives each file a tight min/max envelope on all dimensions
  * at once, and parquet footer stats then skip files for predicates on
  * any of them (not just the first sort key, which is all a
  * lexicographic sort can offer).
  *
  * The index is a pure bit-interleave expression tree (shift/and/or of
  * BIGINT) — codegen'd, map-side, zero shuffle; the only shuffle in a
  * z-ordered write is the `repartitionByRange` that tiles the curve.
  */
object ZOrder {

  /** Interleave the low `bits` bits of each column: column `j` of `d`
    * owns bit positions `j, j+d, j+2d, …`. Inputs must be non-negative
    * integers already quantized to `[0, 2^bits)` — quantization is the
    * caller's choice (bucket widths are a layout policy, not a math
    * fact).
    */
  def zindex(bits: Int, cols: Column*): Column = {
    require(cols.nonEmpty && bits >= 1 && bits * cols.size <= 63,
      s"zindex: need 1+ columns and bits*dims <= 63, got bits=$bits dims=${cols.size}")
    val d = cols.size
    cols.zipWithIndex.map { case (c, j) =>
      (0 until bits).map { i =>
        shiftleft(shiftright(c.cast("long"), i).bitwiseAND(lit(1L)), i * d + j)
      }.reduce(_ bitwiseOR _)
    }.reduce(_ bitwiseOR _)
  }

  /** The same interleave as ANSI-ish SQL over BIGINT bit operators —
    * kept adjacent to [[zindex]] so the two stay in lockstep (the
    * oracle gate compares their outputs bit-for-bit).
    */
  def zindexSql(bits: Int, cols: Seq[String]): String = {
    val d = cols.size
    cols.zipWithIndex.flatMap { case (c, j) =>
      (0 until bits).map(i => s"((($c >> $i) & 1) << ${i * d + j})")
    }.mkString(" | ")
  }
}
