package graft.tools
import org.apache.spark.sql.SparkSession
// scratch: plan audit of the round-10 queries — pruning + topk shapes
object PlanAudit10 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.prepare(spark)
    val dir = "/root/testdata/sf0.001"
    for (n <- Seq("bpe_merges", "lm_kn_counts")) {
      val p = graft.SparkEntry.queries(n)(spark, dir)
        .queryExecution.executedPlan.toString
      println(s"=== $n topk=${p.contains("TakeOrderedAndProject")}")
      p.linesIterator.filter(_.contains("ReadSchema")).foreach(l =>
        println(l.trim.take(200)))
    }
    spark.stop()
  }
}
