package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A/B for profile_keys: same Expand question as profile_columns —
  * four count_distincts in one agg vs one single-distinct leg per
  * candidate crossJoined with the row count.
  */
object ProfileKeysShapes {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("GRAFT_AB_DIR", "/tmp/graft-scale/x30")
    val reps = sys.env.getOrElse("GRAFT_AB_REPS", "6").toInt
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)

    def legs(): DataFrame = {
      val o = graft.Tables.orders(spark, dir)
      val one = o.agg(count(lit(1)).as("n"))
        .crossJoin(o.agg(count_distinct(col("o_orderkey")).as("d1")))
        .crossJoin(o.agg(count_distinct(col("o_custkey")).as("d2")))
        .crossJoin(o.agg(count_distinct(col("o_custkey"),
          col("o_orderdate")).as("d3")))
        .crossJoin(o.agg(count_distinct(col("o_orderstatus")).as("d4")))
      val rows = Seq(("o_orderkey", "d1"), ("o_custkey", "d2"),
        ("o_custkey,o_orderdate", "d3"), ("o_orderstatus", "d4")).map {
        case (name, d) => struct(lit(name).as("candidate"),
          col("n").as("n_rows"), col(d).as("n_distinct"),
          (col("n") - col(d)).as("n_violations"),
          (col(d) === col("n")).as("is_key"))
      }
      one.select(explode(array(rows: _*)).as("p"))
        .select(col("p.*"))
        .orderBy("candidate")
    }

    def prod(): DataFrame =
      graft.queries.OpsQueries.profileKeys(spark, dir)

    def time(f: => DataFrame): Double = {
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    time(prod()); time(legs())
    (1 to reps).foreach { r =>
      val a = time(prod()); val b = time(legs())
      println(f"""{"rep":$r,"prod":$a%.2f,"legs":$b%.2f}""")
    }
    val d1 = prod(); val d2 = legs()
    val eq = d1.exceptAll(d2).count() + d2.exceptAll(d1).count()
    println(s"""{"equal":${eq == 0L}}""")
    spark.stop()
  }
}
