package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-split + variant A/B for `join_regional_revenue` (VERDICT r19
  * #5): the plainest star-join in the suite sits at ~4.5× its DuckDB
  * twin at 30×, adjudicated job-floor on evidence that predates the
  * canary-relative method. Redone here with alternating reps and
  * canary stamps at both ends:
  *
  *  - scan floors: the two fact projections alone;
  *  - join-only: lineitem ⋈ orders shipping a trivial column;
  *  - full variants: production; shuffle_hash-hinted fact join;
  *    dim-fold (orders → (o_orderkey, n_name, r_name) via broadcasts
  *    BEFORE the fact join — half the post-join width); dim-fold +
  *    shuffle_hash.
  *
  * Every variant returns the identical result (same groupBy over the
  * same values — cross-checked before timing).
  */
object ProfileRegionalJoin {

  private def li(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.lineitem(spark, dir)
      .select(col("l_orderkey"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))

  /** orders pre-folded to (o_orderkey, n_name, r_name) through the
    * broadcast dims — the shape that halves post-join width.
    */
  private def ordFolded(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
      .join(broadcast(graft.Tables.customer(spark, dir)
        .select("c_custkey", "c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(graft.Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(graft.Tables.region(spark, dir)),
        col("n_regionkey") === col("r_regionkey"))
      .select("o_orderkey", "n_name", "r_name")

  private def dimFold(spark: SparkSession, dir: String,
      shj: Boolean): DataFrame = {
    val ord = ordFolded(spark, dir)
    val right = if (shj) ord.hint("shuffle_hash") else ord
    li(spark, dir).join(right, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(round(sum(col("rev")), 2).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("r_name", "n_name")
  }

  private def productionShj(spark: SparkSession, dir: String): DataFrame = {
    val ord = graft.Tables.orders(spark, dir)
      .select("o_orderkey", "o_custkey").hint("shuffle_hash")
    li(spark, dir).join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(graft.Tables.customer(spark, dir)
        .select("c_custkey", "c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(graft.Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(graft.Tables.region(spark, dir)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(round(sum(col("rev")), 2).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("r_name", "n_name")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = sys.env.getOrElse("GRAFT_AB_RUNS", "5").toInt
    val spark = Harness.session()

    def noop(f: => DataFrame): Double =
      Harness.time(f.write.format("noop").mode("overwrite").save())
    def med(a: Seq[Double]) = a.sorted.apply((a.length - 1) / 2)

    def full(): DataFrame =
      graft.queries.RelationalQueries.regionalRevenue(spark, sfDir)

    // result equality across variants (also warms all paths)
    val base = full().collect().toSeq
    require(dimFold(spark, sfDir, shj = false).collect().toSeq == base,
      "dimFold diverges")
    require(dimFold(spark, sfDir, shj = true).collect().toSeq == base,
      "dimFold+shj diverges")
    require(productionShj(spark, sfDir).collect().toSeq == base,
      "production+shj diverges")

    val c0 = graft.Bench.canary(spark, 32)
    val tFull = new scala.collection.mutable.ArrayBuffer[Double]
    val tShj = new scala.collection.mutable.ArrayBuffer[Double]
    val tFold = new scala.collection.mutable.ArrayBuffer[Double]
    val tFoldShj = new scala.collection.mutable.ArrayBuffer[Double]
    val tScan = new scala.collection.mutable.ArrayBuffer[Double]
    val tJoin = new scala.collection.mutable.ArrayBuffer[Double]
    (1 to runs).foreach { _ =>
      tFull += noop(full())
      tShj += noop(productionShj(spark, sfDir))
      tFold += noop(dimFold(spark, sfDir, shj = false))
      tFoldShj += noop(dimFold(spark, sfDir, shj = true))
      tScan += noop(li(spark, sfDir))
      tJoin += noop(li(spark, sfDir)
        .join(graft.Tables.orders(spark, sfDir)
          .select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .select((col("rev") + col("o_custkey")).as("_x")))
    }
    val c1 = graft.Bench.canary(spark, 32)

    println(f"""{"sf":"$sfDir","canary":[$c0%.3f,$c1%.3f],"full_med":${med(tFull.toSeq)}%.2f,"shj_med":${med(tShj.toSeq)}%.2f,"fold_med":${med(tFold.toSeq)}%.2f,"fold_shj_med":${med(tFoldShj.toSeq)}%.2f,"scan_med":${med(tScan.toSeq)}%.2f,"join_med":${med(tJoin.toSeq)}%.2f,"full":[${tFull.map(x => f"$x%.2f").mkString(",")}],"shj":[${tShj.map(x => f"$x%.2f").mkString(",")}],"fold":[${tFold.map(x => f"$x%.2f").mkString(",")}],"fold_shj":[${tFoldShj.map(x => f"$x%.2f").mkString(",")}],"scan":[${tScan.map(x => f"$x%.2f").mkString(",")}],"join":[${tJoin.map(x => f"$x%.2f").mkString(",")}]}""")
    spark.stop()
  }
}
