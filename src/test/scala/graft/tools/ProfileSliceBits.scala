package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A/B for the r18 bit-sliced selection core (r17 verdict #6
  * "shave the selection passes"): the former 3-pass adaptive core
  * (global (min,max) fixes a slice width → histogram → wanted-slice
  * collect) reconstructed inline vs the shipped 2-pass IEEE-754
  * bit-sliced core (`Quantiles.groupedOrderStats` — no range pass),
  * on the percentiles production shape (orders.o_totalprice by
  * o_orderpriority, q ∈ {0.5, 0.9, 0.99}), plus fresh full-query
  * stamps for `percentiles` and `binning_equidepth`.
  */
object ProfileSliceBits {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("GRAFT_AB_DIR", "/tmp/graft-scale/x30")
    val reps = sys.env.getOrElse("GRAFT_AB_REPS", "6").toInt
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)

    // ---- the r17 adaptive 3-pass core, reconstructed --------------
    def adaptive3(df: DataFrame, groupCol: String, valueCol: String,
        qs: Seq[Double], targetSlices: Int = 16384):
        Seq[(String, Long, Seq[Option[Double]])] = {
      val v = col(valueCol).cast("double")
      val g = col(groupCol).cast("string")
      val mm = df.agg(min(v).as("mn"), max(v).as("mx")).collect().head
      require(!mm.isNullAt(0), "A/B corpus has values")
      val width = Math.max((mm.getDouble(1) - mm.getDouble(0)) /
        targetSlices.toDouble, java.lang.Double.MIN_NORMAL)
      val slice = floor((v - lit(mm.getDouble(0))) / lit(width))
      val hist = df
        .groupBy(g.as("g"), coalesce(slice, lit(Long.MinValue)).as("h"))
        .agg(count(lit(1)).as("c"), min(v).as("mn"), max(v).as("mx"))
        .collect()
      case class Slice(h: Long, c: Long, mn: Double, mx: Double, cum: Long)
      val groups = hist.groupBy(_.getString(0)).map { case (gk, rows) =>
        val nTotal = rows.map(_.getLong(2)).sum
        var acc = 0L
        val slices = rows.filter(_.getLong(1) != Long.MinValue)
          .sortBy(_.getLong(1)).map { r =>
            val s = Slice(r.getLong(1), r.getLong(2), r.getDouble(3),
              r.getDouble(4), acc)
            acc += r.getLong(2); s
          }
        (gk, nTotal, slices.toSeq, acc)
      }.toSeq.sortBy(t => Option(t._1))
      def sliceFor(ss: Seq[Slice], p: Long): Slice =
        ss.find(s => p < s.cum + s.c).get
      val wanted = scala.collection.mutable.Set.empty[(String, Long)]
      groups.foreach { case (gk, _, ss, nVals) =>
        qs.flatMap { q =>
          val pos = q * (nVals - 1)
          Seq(pos.floor.toLong, pos.ceil.toLong)
        }.distinct.foreach { p =>
          val s = sliceFor(ss, p)
          if (s.mn != s.mx) wanted += ((gk, s.h))
        }
      }
      import spark.implicits._
      val collected: Map[(String, Long), Array[Double]] =
        if (wanted.isEmpty) Map.empty
        else {
          val w = broadcast(wanted.toSeq.toDF("_wg", "_wh"))
          df.select(g.as("g"), slice.as("h"), v.as("v"))
            .filter(col("v").isNotNull)
            .join(w, col("g") <=> col("_wg") && col("h") === col("_wh"),
              "leftsemi")
            .collect()
            .groupBy(r => (r.getString(0), r.getLong(1)))
            .map { case (k, rows) => (k, rows.map(_.getDouble(2)).sorted) }
        }
      groups.map { case (gk, nTotal, ss, nVals) =>
        def at(p: Long): Double = {
          val s = sliceFor(ss, p)
          if (s.mn == s.mx) s.mn else collected((gk, s.h))((p - s.cum).toInt)
        }
        val vals = qs.map { q =>
          if (nVals == 0) None: Option[Double]
          else {
            val pos = q * (nVals - 1)
            val lower = pos.floor.toLong; val higher = pos.ceil.toLong
            val lo = at(lower)
            Some(if (higher == lower) lo
            else { val hi = at(higher)
              if (hi == lo) lo else (higher - pos) * lo + (pos - lower) * hi })
          }
        }
        (gk, nTotal, vals)
      }
    }

    def ord: DataFrame = graft.Tables.orders(spark, dir)
    val qs = Seq(0.5, 0.9, 0.99)

    def timeCore(f: => Seq[(String, Long, Seq[Option[Double]])]): (Double, Seq[(String, Long, Seq[Option[Double]])]) = {
      val t0 = System.nanoTime()
      val r = f
      ((System.nanoTime() - t0) / 1e9, r)
    }
    def timeQ(f: => DataFrame): Double = {
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    // warmup + equality pin
    val (_, a0) = timeCore(adaptive3(ord, "o_orderpriority", "o_totalprice", qs))
    val (_, b0) = timeCore(graft.ext.Quantiles.groupedExact(
      ord, "o_orderpriority", "o_totalprice", qs))
    println(s"""{"equal":${a0 == b0}}""")
    timeQ(graft.queries.SetOpQueries.percentiles(spark, dir))
    timeQ(graft.queries.AnalyticsQueries.binningEquidepth(spark, dir))

    (1 to reps).foreach { r =>
      val (ta, _) = timeCore(adaptive3(ord, "o_orderpriority", "o_totalprice", qs))
      val (tb, _) = timeCore(graft.ext.Quantiles.groupedExact(
        ord, "o_orderpriority", "o_totalprice", qs))
      val tp = timeQ(graft.queries.SetOpQueries.percentiles(spark, dir))
      val tbin = timeQ(graft.queries.AnalyticsQueries.binningEquidepth(spark, dir))
      println(f"""{"rep":$r,"adaptive3":$ta%.2f,"bitsliced2":$tb%.2f,""" +
        f""""percentiles_q":$tp%.2f,"binning_q":$tbin%.2f}""")
    }
    spark.stop()
  }
}
