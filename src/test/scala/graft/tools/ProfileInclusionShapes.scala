package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A/B for profile_inclusion:
  *  - prod:     r15 two-phase (row-grain broadcast join, then
  *              key-grain groupBy + fold) — the baseline
  *  - keygrain: aggregate the probe side to key grain FIRST, then a
  *              key-grain join against the referenced distinct keys —
  *              no broadcast build (no driver collect of a fact-sized
  *              key set), no row-grain hash probes; orphan-ness is a
  *              key property so the join moves only |keys| rows
  */
object ProfileInclusionShapes {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("GRAFT_AB_DIR", "/tmp/graft-scale/x30")
    val reps = sys.env.getOrElse("GRAFT_AB_REPS", "6").toInt
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)

    def keygrainOne(name: String, left: DataFrame, lk: String,
        right: DataFrame, rk: String): DataFrame = {
      val perKey = left.select(col(lk).as("_lk"))
        .groupBy(col("_lk")).agg(count(lit(1)).as("_n"))
      perKey.join(right.select(col(rk).as("_rk")).distinct(),
          col("_lk") === col("_rk"), "left")
        .agg(sum(col("_n")).as("n_rows"),
          count(when(col("_lk").isNotNull, 1)).as("n_keys"),
          sum(when(col("_rk").isNull, col("_n")).otherwise(0L))
            .as("n_orphan_rows"),
          count(when(col("_rk").isNull && col("_lk").isNotNull, 1))
            .as("n_orphan_keys"))
        .select(lit(name).as("dependency"), col("n_rows"), col("n_keys"),
          col("n_orphan_rows"), col("n_orphan_keys"),
          (col("n_orphan_rows") === 0).as("is_fk"))
    }

    def keygrain(): DataFrame =
      keygrainOne("lineitem.l_orderkey->orders.o_orderkey",
          graft.Tables.lineitem(spark, dir), "l_orderkey",
          graft.Tables.orders(spark, dir), "o_orderkey")
        .unionByName(keygrainOne("orders.o_custkey->customer.c_custkey",
          graft.Tables.orders(spark, dir), "o_custkey",
          graft.Tables.customer(spark, dir), "c_custkey"))
        .unionByName(keygrainOne("lineitem.l_partkey->part.p_partkey",
          graft.Tables.lineitem(spark, dir), "l_partkey",
          graft.Tables.part(spark, dir), "p_partkey"))
        .unionByName(keygrainOne("events.user_id->supplier.s_suppkey",
          graft.Tables.events(spark, dir), "user_id",
          graft.Tables.supplier(spark, dir), "s_suppkey"))
        .orderBy("dependency")

    // both sides ride ONE exchange under a side tag — the join stage
    // disappears; orphan-ness falls out of the per-key fold (a key
    // never seen on the right has _inref = 0). Right-side nulls are
    // filtered to preserve the join's null-never-matches semantics.
    def taggedOne(name: String, left: DataFrame, lk: String,
        right: DataFrame, rk: String): DataFrame = {
      val tagged = left.select(col(lk).as("k"), lit(1L).as("n"),
          lit(0).as("r"))
        .unionAll(right.select(col(rk).as("k"), lit(0L).as("n"),
          lit(1).as("r")).filter(col("k").isNotNull))
      tagged.groupBy(col("k"))
        .agg(sum(col("n")).as("_n"), max(col("r")).as("_inref"))
        .agg(sum(col("_n")).as("n_rows"),
          count(when(col("_n") > 0 && col("k").isNotNull, 1)).as("n_keys"),
          sum(when(col("_inref") === 0, col("_n")).otherwise(0L))
            .as("n_orphan_rows"),
          count(when(col("_inref") === 0 && col("_n") > 0 &&
            col("k").isNotNull, 1)).as("n_orphan_keys"))
        .select(lit(name).as("dependency"), col("n_rows"), col("n_keys"),
          col("n_orphan_rows"), col("n_orphan_keys"),
          (col("n_orphan_rows") === 0).as("is_fk"))
    }

    def tagged(): DataFrame =
      taggedOne("lineitem.l_orderkey->orders.o_orderkey",
          graft.Tables.lineitem(spark, dir), "l_orderkey",
          graft.Tables.orders(spark, dir), "o_orderkey")
        .unionByName(taggedOne("orders.o_custkey->customer.c_custkey",
          graft.Tables.orders(spark, dir), "o_custkey",
          graft.Tables.customer(spark, dir), "c_custkey"))
        .unionByName(taggedOne("lineitem.l_partkey->part.p_partkey",
          graft.Tables.lineitem(spark, dir), "l_partkey",
          graft.Tables.part(spark, dir), "p_partkey"))
        .unionByName(taggedOne("events.user_id->supplier.s_suppkey",
          graft.Tables.events(spark, dir), "user_id",
          graft.Tables.supplier(spark, dir), "s_suppkey"))
        .orderBy("dependency")

    def prod(): DataFrame =
      graft.queries.OpsQueries.profileInclusion(spark, dir)

    def time(f: => DataFrame): Double = {
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    time(prod()); time(keygrain()); time(tagged())
    (1 to reps).foreach { r =>
      val a = time(prod())
      val b = time(keygrain())
      val c = time(tagged())
      println(f"""{"rep":$r,"prod":$a%.2f,"keygrain":$b%.2f,"tagged":$c%.2f}""")
    }
    val d1 = prod()
    val d2 = keygrain()
    val d3 = tagged()
    val eq = d1.exceptAll(d2).count() + d2.exceptAll(d1).count() +
      d1.exceptAll(d3).count() + d3.exceptAll(d1).count()
    println(s"""{"equal":${eq == 0L}}""")
    spark.stop()
  }
}
