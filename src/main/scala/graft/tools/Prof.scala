package graft.tools

import org.apache.spark.sql.functions._

import graft._

/** Scratch profiling main (dev tool). */
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    val dir = "/root/testdata/sf0.1"
    spark.read.parquet(s"$dir/lineitem.parquet").count() // warm
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(s"PROF $label: ${(System.nanoTime() - t0) / 1e9}")
      r
    }
    def edgesBroadcastLong = broadcast(Tables.orders(spark, dir)
        .select(col("o_orderkey"), col("o_custkey")))
      .join(Tables.lineitem(spark, dir), col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()
    def edgesPlainLong = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(spark, dir), col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()
    def edgesBroadcastStr = broadcast(Tables.orders(spark, dir)
        .select(col("o_orderkey"), col("o_custkey")))
      .join(Tables.lineitem(spark, dir), col("o_orderkey") === col("l_orderkey"))
      .select(concat(lit("c:"), col("o_custkey")).as("src"),
        concat(lit("s:"), col("l_suppkey")).as("dst"))
      .distinct()
    for (i <- 1 to 2) {
      time(s"bcast-long $i") { edgesBroadcastLong.localCheckpoint() }
      time(s"plain-long $i") { edgesPlainLong.localCheckpoint() }
      time(s"bcast-str  $i") { edgesBroadcastStr.localCheckpoint() }
      time(s"join-only  $i") {
        broadcast(Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey")))
          .join(Tables.lineitem(spark, dir), col("o_orderkey") === col("l_orderkey"))
          .select((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
          .count()
      }
      time(s"distinct-only-from-ckpt $i") {
        val base = broadcast(Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey")))
          .join(Tables.lineitem(spark, dir), col("o_orderkey") === col("l_orderkey"))
          .select((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
          .localCheckpoint()
        time(s"  inner distinct $i") { base.distinct().count() }
      }
    }
    spark.stop()
  }
}
