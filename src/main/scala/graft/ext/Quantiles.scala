package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact grouped order statistics by distributed SELECTION — the
  * scale-safe replacement for the `percentile` aggregate, whose
  * buffer holds every distinct value of a group in one task's memory
  * and whose final merge+sort runs one task per group (the fixed-key
  * parallelism cap, again).
  *
  * Three bounded passes, all parallel and pruned to two columns:
  *  1. global (min, max) of the value — fixes a slice width so the
  *     histogram is ≤ `targetSlices` rows per group BY CONSTRUCTION;
  *  2. (group, slice) histogram with per-slice count/min/max — the
  *     driver locates, per wanted order statistic, which slice holds
  *     it; a slice whose min == max resolves immediately (degenerate
  *     distributions never collect);
  *  3. collect ONLY the needed slices' values (expected |group|/
  *     slices rows each) and read the order statistics off the
  *     sorted slice.
  *
  * [[groupedOrderStats]] is the shared core (exact values at
  * arbitrary 0-based positions); [[groupedExact]] adds the
  * `Percentile.getPercentile`-bit-parity interpolation on top;
  * `graft.queries.AnalyticsQueries.equidepthBins` reads its three
  * bin-boundary statistics from the same core.
  */
object Quantiles {

  /** Per-group exact order-statistic VALUES at caller-chosen 0-based
    * positions into the group's ascending NON-NULL values.
    * `positionsFor(nTotal, nVals)` names the positions a group needs
    * (each must lie in `[0, nVals)`; duplicates are fine). Returns,
    * per group, NULL group key first: (group key cast to string,
    * nTotal rows incl. null values, nVals non-null values,
    * position → value map over exactly the requested positions).
    *
    * DRIVER-MEMORY ENVELOPE — ENFORCED: the pass-2 histogram holds up
    * to |groups| × min(targetSlices, distinct slices present) rows of
    * ~40 bytes, and `histCap` (default 2²¹ rows ≈ 85 MB) makes that an
    * enforced contract, not a comment: the driver fetches at most
    * `histCap + 1` rows (same single job) and fails loud past the cap
    * instead of an unbounded `collect()` OOM. The default
    * `targetSlices` = 16384 is sized for LOW-cardinality groupings
    * (≲ 10³ groups); a high-cardinality group column must lower
    * `targetSlices` proportionally (the result itself is
    * group-grain and driver-sized by contract, so |groups| ≫ 10⁵ is
    * outside this helper's intended regime regardless). `sliceCap`
    * separately bounds pass 3: no single collected slice may exceed
    * it.
    */
  def groupedOrderStats(df: DataFrame, groupCol: String,
      valueCol: String, positionsFor: (Long, Long) => Seq[Long],
      targetSlices: Int = 16384,
      sliceCap: Long = 8L * 1000 * 1000, histCap: Int = 1 << 21):
      Seq[(String, Long, Long, Map[Long, Double])] = {
    val v = col(valueCol).cast("double")
    val g = col(groupCol).cast("string")
    val mm = df.agg(min(v).as("mn"), max(v).as("mx")).collect().head
    if (mm.isNullAt(0)) { // no non-null values anywhere
      return df.groupBy(g.as("g")).agg(count(lit(1)).as("n")).collect()
        .map(r => (r.getString(0), r.getLong(1), 0L,
          Map.empty[Long, Double]))
        .toSeq.sortBy(t => Option(t._1))
    }
    val width = Math.max((mm.getDouble(1) - mm.getDouble(0)) /
      targetSlices.toDouble, java.lang.Double.MIN_NORMAL)
    val slice = floor((v - lit(mm.getDouble(0))) / lit(width))
    val hist = df
      .groupBy(g.as("g"), coalesce(slice, lit(Long.MinValue)).as("h"))
      .agg(count(lit(1)).as("c"), min(v).as("mn"), max(v).as("mx"))
      .take(histCap + 1)
    require(hist.length <= histCap,
      s"grouped-quantile histogram exceeds histCap ($histCap rows): " +
        s"|groups| × targetSlices ($targetSlices) is past the driver " +
        "envelope — lower targetSlices, or this grouping is too " +
        "high-cardinality for a driver-sized quantile table")
    val perG = hist.groupBy(_.getString(0))
    // locate the slice holding 0-based order statistic p: cumulative
    // counts over h-ascending non-null slices
    case class Slice(h: Long, c: Long, mn: Double, mx: Double, cum: Long)
    val groups = perG.map { case (gk, rows) =>
      val nTotal = rows.map(_.getLong(2)).sum
      val nonNull = rows.filter(!_.isNullAt(1))
        .filter(_.getLong(1) != Long.MinValue)
        .sortBy(_.getLong(1))
      var acc = 0L
      val slices = nonNull.map { r =>
        val s = Slice(r.getLong(1), r.getLong(2), r.getDouble(3),
          r.getDouble(4), acc)
        acc += r.getLong(2)
        s
      }
      (gk, nTotal, slices.toSeq, acc)
    }.toSeq.sortBy(t => Option(t._1)) // a NULL group key sorts first, NPE-free
    // which (group, slice) pairs actually need their values?
    val wanted = scala.collection.mutable.Set.empty[(String, Long)]
    def sliceFor(slices: Seq[Slice], p: Long): Slice =
      slices.find(s => p < s.cum + s.c).get
    val positions: Map[String, Seq[Long]] = groups.map {
      case (gk, nTotal, slices, nVals) =>
        val ps = positionsFor(nTotal, nVals).distinct
        ps.foreach { p =>
          require(p >= 0 && p < nVals,
            s"order-statistic position $p out of range [0, $nVals) " +
              s"for group '$gk'")
          val s = sliceFor(slices, p)
          if (s.mn != s.mx) {
            require(s.c <= sliceCap,
              s"quantile slice ($gk, ${s.h}) holds ${s.c} values " +
                s"(cap $sliceCap): a pathologically skewed value " +
                "distribution — raise targetSlices or the cap")
            wanted += ((gk, s.h))
          }
        }
        (gk, ps)
    }.toMap
    val collected: Map[(String, Long), Array[Double]] =
      if (wanted.isEmpty) Map.empty
      else {
        // membership by broadcast semi-join on the (group, slice) PAIR,
        // never a string encoding: a concat_ws key lets a group value
        // containing the separator alias another (group, slice), and
        // concat_ws SKIPS a null group while the driver-side key spells
        // "null" — either way the wrong slice population reaches the
        // interpolation. `<=>` matches the null group key exactly.
        val spark = df.sparkSession
        import spark.implicits._
        val w = broadcast(wanted.toSeq.toDF("_wg", "_wh"))
        df.select(g.as("g"), slice.as("h"), v.as("v"))
          .filter(col("v").isNotNull)
          .join(w, col("g") <=> col("_wg") && col("h") === col("_wh"),
            "leftsemi")
          .collect()
          .groupBy(r => (r.getString(0), r.getLong(1)))
          .map { case (k, rows) => (k, rows.map(_.getDouble(2)).sorted) }
      }
    groups.map { case (gk, nTotal, slices, nVals) =>
      def at(p: Long): Double = {
        val s = sliceFor(slices, p)
        if (s.mn == s.mx) s.mn
        else collected((gk, s.h))((p - s.cum).toInt)
      }
      (gk, nTotal, nVals, positions(gk).map(p => p -> at(p)).toMap)
    }
  }

  /** Per group: (n_rows including null values, quantile value per q —
    * NaN-free Option, None when the group has no non-null values).
    * Interpolation replicates Spark's `Percentile.getPercentile`
    * bit-for-bit: `pos = q·(n−1)`,
    * `(higher−pos)·v_lo + (pos−lower)·v_hi`, null values excluded
    * from positions. Driver envelope: see [[groupedOrderStats]].
    */
  def groupedExact(df: DataFrame, groupCol: String, valueCol: String,
      qs: Seq[Double], targetSlices: Int = 16384,
      sliceCap: Long = 8L * 1000 * 1000, histCap: Int = 1 << 21):
      Seq[(String, Long, Seq[Option[Double]])] = {
    val stats = groupedOrderStats(df, groupCol, valueCol,
      (_, nVals) =>
        if (nVals == 0) Nil
        else qs.flatMap { q =>
          val pos = q * (nVals - 1)
          Seq(pos.floor.toLong, pos.ceil.toLong)
        },
      targetSlices, sliceCap, histCap)
    stats.map { case (gk, nTotal, nVals, at) =>
      val vals = qs.map { q =>
        if (nVals == 0) None
        else {
          val pos = q * (nVals - 1)
          val lower = pos.floor.toLong
          val higher = pos.ceil.toLong
          val lo = at(lower)
          Some(
            if (higher == lower) lo
            else {
              val hi = at(higher)
              if (hi == lo) lo
              else (higher - pos) * lo + (pos - lower) * hi
            })
        }
      }
      (gk, nTotal, vals)
    }
  }
}
