package graft.tools

import org.apache.spark.sql.functions._

/** One-off plan audit for the composed PPJoin: where do the exchanges
  * land, is the prefix self-join's shuffle reused, what does the
  * candidate distinct cost?
  */
object PlanPpJoin {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = Harness.session()
    val docs = graft.Tables.documents(spark, sfDir)
    val pairs = graft.ext.PpJoin.pairs(docs, "doc_id", "text", 3, 0.5)
    println(pairs.queryExecution.executedPlan.toString.take(12000))
    println("== n_pairs: " + pairs.count())
    spark.stop()
  }
}
