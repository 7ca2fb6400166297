package graft.tools

import org.apache.spark.sql.functions._

/** A/B for the r18-verdict #8 pass-1 value ride: the shipped 2-pass
  * selection core (`Quantiles.groupedExact` — histogram, then only
  * the needed slices gather) vs a SINGLE-scan variant whose histogram
  * carries every slice's sorted values (`sort_array(collect_list)`
  * riding the same group-by), so no slice ever needs a second scan.
  * Shape = the percentiles production query (orders.o_totalprice by
  * o_orderpriority, q ∈ {0.5, 0.9, 0.99}); equality is asserted
  * before timing; alternating reps so host drift can't masquerade as
  * a variant.
  *
  * MEASURED (2026-08-16, this tool): the ride LOSES at every point —
  * sf0.1 0.33 s off vs 0.41 s on; 30× 1.01 s off vs 2.20 s on — the
  * whole column (36 MB at 30×) rides the exchange and the driver
  * fetch, and the object-hash aggregate (collect buffers kick the
  * histogram out of whole-stage hash agg) costs more than the one
  * targeted job it saves. Production keeps the 2-pass core; the ride
  * was NOT landed (the r18 verdict's own "land only on a win").
  */
object ProfileSliceRide {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("GRAFT_AB_DIR", "/tmp/graft-scale/x30")
    val reps = sys.env.getOrElse("GRAFT_AB_REPS", "6").toInt
    val spark = Harness.session()
    val orders = graft.Tables.orders(spark, dir).localCheckpoint()
    orders.count()
    val qs = Seq(0.5, 0.9, 0.99)

    def off(): Seq[(String, Long, Seq[Option[Double]])] =
      graft.ext.Quantiles.groupedExact(orders, "o_orderpriority",
        "o_totalprice", qs)

    // the ride variant: ONE scan — the production histogram's exact
    // (group, slice) grain, plus each slice's sorted values; the
    // driver reads every order statistic straight off the arrays.
    // Same binadeBits=10 slicing (shift 42), same interpolation.
    def ride(): Seq[(String, Long, Seq[Option[Double]])] = {
      val v = col("o_totalprice").cast("double")
      val g = col("o_orderpriority").cast("string")
      val h = shiftright(call_function("graft_sortable_bits", v), 42)
      val hist = orders
        .groupBy(g.as("g"), coalesce(h, lit(Long.MinValue)).as("h"))
        .agg(count(lit(1)).as("c"),
          sort_array(collect_list(v)).as("vs"))
        .collect()
      hist.groupBy(_.getString(0)).map { case (gk, rows) =>
        val nTotal = rows.map(_.getLong(2)).sum
        val slices = rows.filter(_.getLong(1) != Long.MinValue)
          .sortBy(_.getLong(1))
        val vals = slices.flatMap(_.getSeq[Double](3))
        val nVals = vals.length.toLong
        val out = qs.map { q =>
          if (nVals == 0) None: Option[Double]
          else {
            val pos = q * (nVals - 1)
            val lower = pos.floor.toLong
            val higher = pos.ceil.toLong
            val lo = vals(lower.toInt)
            Some(
              if (higher == lower) lo
              else {
                val hi = vals(higher.toInt)
                if (hi == lo) lo
                else (higher - pos) * lo + (pos - lower) * hi
              })
          }
        }
        (gk, nTotal, out)
      }.toSeq.sortBy(t => Option(t._1))
    }

    require(off() == ride(), "variants disagree")

    def med(a: Seq[Double]) = a.sorted.apply((a.length - 1) / 2)
    def fmt(a: Seq[Double]) = a.map(x => f"$x%.3f").mkString(",")
    Harness.time(off()); Harness.time(ride()) // warm both paths
    val tOff = collection.mutable.ArrayBuffer.empty[Double]
    val tOn = collection.mutable.ArrayBuffer.empty[Double]
    (1 to reps).foreach { _ =>
      tOff += Harness.time(off()); tOn += Harness.time(ride())
    }
    println(f"""{"dir":"$dir","off_med":${med(tOff.toSeq)}%.3f,"ride_med":${med(tOn.toSeq)}%.3f,"off":[${fmt(tOff.toSeq)}],"ride":[${fmt(tOn.toSeq)}]}""")
    spark.stop()
  }
}
