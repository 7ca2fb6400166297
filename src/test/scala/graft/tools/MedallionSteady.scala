package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Incremental-medallion steady-state measurement (r12 verdict #3):
  * does per-batch cost stay ∝ batch while the corpus grows?
  *
  * The events corpus (optionally a ScaleCurve x{m} replica) is split
  * into K contiguous day-range batches. Each batch is APPENDED to a
  * landing dir — the arrival shape of a real feed — and
  * [[graft.pipeline.Medallion.run]] re-runs against the SAME
  * materialization root: the stg watermark scopes new rows, the int
  * merge folds latest-per-key decomposably, the dwh merge rewrites
  * only the touched-day partitions. The watermark + merge contract
  * predicts FLAT per-batch wall as the corpus grows; a superlinear
  * trend here means some layer still rescans history.
  *
  * A final zero-new-rows run measures the no-op replay floor (watermark
  * scan + empty-pending short-circuit), and the steady-state dwh table
  * is diffed against a one-shot full build into a fresh root — the
  * incremental path must land byte-equal aggregates.
  *
  * Usage (env):
  *   GRAFT_STEADY_SRC      events source dir (default /tmp/graft-scale/x10)
  *   GRAFT_STEADY_BATCHES  day-range batch count (default 6)
  *   GRAFT_STEADY_ROOT     work root (default /tmp/graft-medallion-steady)
  */
object MedallionSteady {

  def main(args: Array[String]): Unit = {
    val src = sys.env.getOrElse("GRAFT_STEADY_SRC", "/tmp/graft-scale/x10")
    val nBatches = sys.env.getOrElse("GRAFT_STEADY_BATCHES", "6").toInt
    val root = sys.env.getOrElse("GRAFT_STEADY_ROOT",
      "/tmp/graft-medallion-steady")

    val spark = Harness.session()

    val dir = new java.io.File(root)
    if (dir.exists()) {
      import scala.reflect.io.Directory
      new Directory(dir).deleteRecursively()
    }
    val corpusDir = s"$root/corpus"
    val matRoot = s"$root/mat"

    val ev = graft.Tables.events(spark, src)
    val days = ev.select(to_date(col("ts")).as("d")).distinct()
      .orderBy("d").collect().map(_.getDate(0)).toSeq
    // ceil division honors the requested batch count (floor would
    // yield an extra runt batch whenever days % nBatches != 0)
    val chunks = days
      .grouped(math.max(1, (days.size + nBatches - 1) / nBatches)).toSeq
    import Harness.time

    var cumulative = 0L
    chunks.zipWithIndex.foreach { case (chunk, i) =>
      val batch = ev.filter(to_date(col("ts")).isInCollection(chunk))
      val n = batch.count()
      cumulative += n
      batch.write.mode("append").parquet(s"$corpusDir/events.parquet")
      val sec = time(graft.pipeline.Medallion.run(spark, corpusDir, matRoot))
      println(f"""{"batch":$i,"days":${chunk.size},"batch_rows":$n,"corpus_rows":$cumulative,"run_sec":$sec%.2f}""")
    }
    // no-op replay: nothing new landed, every layer must short-circuit
    val noop = time(graft.pipeline.Medallion.run(spark, corpusDir, matRoot))
    println(f"""{"batch":"noop","batch_rows":0,"corpus_rows":$cumulative,"run_sec":$noop%.2f}""")

    // equivalence: incremental steady state == one-shot full build.
    // Exact on keys, counts and max/min (selection aggregates, order-
    // independent); tolerance 1e-3 on the rounded AVG — float summation
    // order differs between the incremental stg layout (written across
    // six merges) and the one-shot layout, which flips round(.,4) on
    // values near a .00005 boundary. Anything beyond that is a bug.
    val oneShotRoot = s"$root/oneshot"
    val full = graft.pipeline.Medallion.run(spark, corpusDir, oneShotRoot)
    val inc = spark.read.parquet(s"$matRoot/dwh_daily")
    def keyed(df: org.apache.spark.sql.DataFrame, tag: String) =
      df.select(col("user_id_date"),
        col("day").as(s"day_$tag"), col("n_events").as(s"n_$tag"),
        col("max_value").as(s"max_$tag"), col("min_value").as(s"min_$tag"),
        col("avg_value").as(s"avg_$tag"))
    // null-SAFE compares throughout: a regression that nulls a metric
    // on one side must count as a mismatch, not vanish into 3-valued
    // logic (x =!= null is NULL, never true). Null-vs-value on avg
    // coalesces to beyond-tolerance.
    def differs(a: String, b: String) = !(col(a) <=> col(b))
    val j = keyed(full, "f").join(keyed(inc, "i"), Seq("user_id_date"), "full")
      .agg(
        count(when(col("day_f").isNull || col("day_i").isNull, 1))
          .as("structural"),
        count(when(differs("n_f", "n_i") || differs("max_f", "max_i") ||
          differs("min_f", "min_i") || differs("day_f", "day_i"), 1))
          .as("exact_mismatch"),
        count(when(differs("avg_f", "avg_i") &&
          coalesce(abs(col("avg_f") - col("avg_i")) > 0.001, lit(true)), 1))
          .as("avg_beyond_tol"),
        count(when(differs("avg_f", "avg_i"), 1))
          .as("avg_rounding_flips"))
      .head()
    println(s"""{"structural":${j.getLong(0)},"exact_mismatch":${j.getLong(1)},"avg_beyond_tol":${j.getLong(2)},"avg_rounding_flips":${j.getLong(3)}}""")
    require(j.getLong(0) == 0 && j.getLong(1) == 0 && j.getLong(2) == 0,
      s"incremental dwh diverged from full build: $j")
    spark.stop()
  }
}
