package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scratch profiling main (dev tool). */
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = GraftSessionLike.local(32)
    val dir = "/root/testdata/sf0.1"
    spark.read.parquet(s"$dir/lineitem.parquet").count() // warm
    def time(label: String)(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"PROF $label: $s%.2f")
      s
    }
    val e = graft.Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"))
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("parts"))
      .select(explode(
        call_function("graft_sorted_pairs_packed", col("parts"))).as("uv"))
      .distinct()
      .select(shiftrightunsigned(col("uv"), 32).as("u"),
        col("uv").bitwiseAND(lit(0xFFFFFFFFL)).as("v"))
      .localCheckpoint()
    val deg = e.select(col("u").as("x")).unionAll(e.select(col("v").as("x")))
      .groupBy(col("x")).agg(count(lit(1)).as("d")).localCheckpoint()
    val ed = e.join(broadcast(deg.select(col("x").as("u"), col("d").as("du"))), "u")
      .join(broadcast(deg.select(col("x").as("v"), col("d").as("dv"))), "v")
    val fwd = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    val orient = ed.select(
      when(fwd, col("u")).otherwise(col("v")).as("s"),
      when(fwd, col("v")).otherwise(col("u")).as("t"))
      .localCheckpoint()
    println(s"PROF nEdges=${orient.count()}")
    val o1 = orient.select(col("s"), col("t").as("b"))
    val o2 = orient.select(col("s"), col("t").as("c"))
    val closing = orient.select(
      shiftleft(least(col("s"), col("t")), 32)
        .bitwiseOR(greatest(col("s"), col("t"))).as("bc"))
    def tail(closeSide: DataFrame): DataFrame =
      o1.join(o2.hint("SHUFFLE_HASH"), Seq("s"))
        .filter(col("b") < col("c"))
        .select(col("s").as("a"),
          shiftleft(col("b"), 32).bitwiseOR(col("c")).as("bc"))
        .join(closeSide, Seq("bc"))
        .select(col("a"), shiftrightunsigned(col("bc"), 32).as("b"),
          col("bc").bitwiseAND(lit(0xFFFFFFFFL)).as("c"))
        .select(explode(array(col("a"), col("b"), col("c"))).as("vertex"))
        .groupBy(col("vertex")).agg(count(lit(1)).as("n_triangles"))
    def noop(f: DataFrame): Unit =
      f.write.format("noop").mode("overwrite").save()
    val bhj = tail(broadcast(closing))
    val shj = tail(closing.hint("SHUFFLE_HASH"))
    noop(bhj); noop(shj) // warm
    // report broadcast relation size once
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
    val q = tail(broadcast(closing))
    noop(q)
    def find(p: org.apache.spark.sql.execution.SparkPlan): Unit = p.foreach {
      case a: AdaptiveSparkPlanExec => find(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        find(s.plan)
      case b: BroadcastExchangeExec =>
        println(s"PROF broadcast dataSize=${b.metrics("dataSize").value} " +
          s"rows=${b.metrics("numOutputRows").value} " +
          s"buildMs=${b.metrics("buildTime").value}")
      case _ =>
    }
    find(q.queryExecution.executedPlan)
    (1 to 4).foreach { i =>
      time(s"close-BHJ $i") { noop(tail(broadcast(closing))) }
      time(s"close-SHJ $i") { noop(tail(closing.hint("SHUFFLE_HASH"))) }
    }
    spark.stop()
  }
}

object GraftSessionLike {
  def local(n: Int): org.apache.spark.sql.SparkSession = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$n]")
      .config("spark.sql.shuffle.partitions", n.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.prepare(spark)
    spark
  }
}
