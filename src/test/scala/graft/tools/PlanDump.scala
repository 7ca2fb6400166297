package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for a comma-separated list of declared
  * queries (GRAFT_PLAN_QUERIES) into GRAFT_PLAN_OUT (default
  * plans/r21), one `<name><suffix>.txt` per query (GRAFT_PLAN_SUFFIX,
  * default `_after`) — the judge-checkable plan evidence the
  * optimization rounds commit. Also prints a one-line summary per
  * query: Exchange count, join strategies, scan count.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("GRAFT_AB_DIR", "/root/testdata/sf0.1")
    val names = sys.env.getOrElse("GRAFT_PLAN_QUERIES", "")
      .split(",").map(_.trim).filter(_.nonEmpty)
    val outDir = sys.env.getOrElse("GRAFT_PLAN_OUT", "plans/r21")
    val suffix = sys.env.getOrElse("GRAFT_PLAN_SUFFIX", "_after")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.prepare(spark)
    Files.createDirectories(Paths.get(outDir))
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, sf)
      val qe = df.queryExecution
      val formatted = qe.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(s"$outDir/$n$suffix.txt"), formatted)
      val ex = "(?m)^\\(?\\d*\\)? *Exchange".r
        .findAllIn(formatted).size
      val joins = Seq("BroadcastHashJoin", "SortMergeJoin",
        "ShuffledHashJoin", "BroadcastNestedLoopJoin")
        .map(j => j -> formatted.sliding(j.length).count(_ == j))
        .filter(_._2 > 0).map { case (j, c) => s"$j×$c" }.mkString(",")
      val scans = formatted.sliding("Scan parquet".length)
        .count(_ == "Scan parquet")
      println(s"== $n exchanges=$ex scans=$scans joins=[$joins] -> $outDir/$n$suffix.txt")
    }
    spark.stop()
  }
}
