package graft.tools

import org.apache.spark.sql.functions._

/** Print the multi-LSH physical plan + pre-flight estimate at a scaled
  * corpus WITHOUT executing the verify (debugging the 30× regime).
  */
object PlanSlsh30 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("GRAFT_AB_DIR", "/tmp/graft-scale/x30")
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val df = graft.SparkEntry.queries("dedup_embedding_lsh_multi")(spark, dir)
    println("=== executedPlan ===")
    println(df.queryExecution.executedPlan.toString.take(8000))
    spark.stop()
  }
}
