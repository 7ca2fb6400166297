package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B for the r22 graph_triangles rewrite: packed-basket edge build +
  * guarded degree-broadcast + packed single-long closing key
  * (`AnalyticsQueries.graphTriangles` + `Graph.triangleCounts`) vs the
  * r21 form reconstructed inline (distinct+self-join edge build,
  * SHUFFLE_HASH degree joins, two-column oriented closing key, no
  * edge/degree materialization). Result equality asserted before
  * timing; alternating reps; stage splits for the edge build alone.
  */
object ProfileTriangles {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("GRAFT_AB_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("GRAFT_AB_REPS", "4").toInt
    val spark = Harness.session()
    spark.read.parquet(s"$dir/lineitem.parquet").count() // warm

    def oldEdges(): DataFrame = {
      val li = graft.Tables.lineitem(spark, dir)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .distinct()
      li.select(col("o"), col("p").as("u"))
        .join(li.select(col("o"), col("p").as("v")), Seq("o"))
        .filter(col("u") < col("v"))
        .select(col("u"), col("v")).distinct()
    }
    def newEdges(): DataFrame =
      graft.Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_partkey"))
        .groupBy(col("l_orderkey"))
        .agg(sort_array(collect_set(col("l_partkey"))).as("parts"))
        .select(explode(
          call_function("graft_sorted_pairs_packed", col("parts"))).as("uv"))
        .distinct()
        .select(shiftrightunsigned(col("uv"), 32).as("u"),
          col("uv").bitwiseAND(lit(0xFFFFFFFFL)).as("v"))

    // the r21 triangleCounts, verbatim (no input checkpoint, shuffled
    // degree joins, oriented two-column closing key)
    def oldTriangles(edges: DataFrame): DataFrame = {
      val deg = edges.select(col("u").as("x"))
        .unionAll(edges.select(col("v").as("x")))
        .groupBy(col("x")).agg(count(lit(1)).as("d"))
      val ed = edges
        .join(deg.select(col("x").as("u"), col("d").as("du"))
          .hint("SHUFFLE_HASH"), "u")
        .join(deg.select(col("x").as("v"), col("d").as("dv"))
          .hint("SHUFFLE_HASH"), "v")
      val fwd = col("du") < col("dv") ||
        (col("du") === col("dv") && col("u") < col("v"))
      val orient = ed.select(
        when(fwd, col("u")).otherwise(col("v")).as("s"),
        when(fwd, col("v")).otherwise(col("u")).as("t"),
        when(fwd, col("dv")).otherwise(col("du")).as("dt"))
        .localCheckpoint()
      val o1 = orient.select(col("s"), col("t").as("b"), col("dt").as("db"))
      val o2 = orient.select(col("s"), col("t").as("c"), col("dt").as("dc"))
      val closeFwd = col("db") < col("dc") ||
        (col("db") === col("dc") && col("b") < col("c"))
      val wedges = o1.join(o2.hint("SHUFFLE_HASH"), Seq("s"))
        .filter(col("b") < col("c"))
        .select(col("s").as("a"), col("b"), col("c"),
          when(closeFwd, col("b")).otherwise(col("c")).as("cs"),
          when(closeFwd, col("c")).otherwise(col("b")).as("ct"))
      val nEdges = orient.count()
      val closing = orient.select(col("s").as("cs"), col("t").as("ct"))
      val closeSide =
        if (nEdges * 64L <= (64L << 20)) broadcast(closing)
        else closing.hint("SHUFFLE_HASH")
      val tri = wedges
        .join(closeSide, Seq("cs", "ct"))
        .select(col("a"), col("b"), col("c"))
      tri.select(explode(array(col("a"), col("b"), col("c"))).as("vertex"))
        .groupBy(col("vertex")).agg(count(lit(1)).as("n_triangles"))
    }

    def oldFull(): DataFrame = oldTriangles(oldEdges())
      .select(col("vertex").as("part"), col("n_triangles"))
      .orderBy("part")
    def newFull(): DataFrame =
      graft.queries.AnalyticsQueries.graphTriangles(spark, dir)

    if (sys.env.get("GRAFT_AB_EXPLAIN").nonEmpty) {
      println("===== BEFORE (r21 form) =====")
      oldFull().explain("formatted")
      println("===== AFTER (r22 form) =====")
      newFull().explain("formatted")
    }
    if (sys.env.get("GRAFT_AB_SKIP_EQ").isEmpty) {
      require(newFull().exceptAll(oldFull()).isEmpty &&
        oldFull().exceptAll(newFull()).isEmpty, "variants disagree")
      println("EQUALITY OK")
    }

    def noop(f: DataFrame): Double =
      Harness.time(f.write.format("noop").mode("overwrite").save())
    // warm both
    noop(oldFull()); noop(newFull())
    val tOldE = collection.mutable.ArrayBuffer.empty[Double]
    val tNewE = collection.mutable.ArrayBuffer.empty[Double]
    val tOld = collection.mutable.ArrayBuffer.empty[Double]
    val tNew = collection.mutable.ArrayBuffer.empty[Double]
    (1 to reps).foreach { _ =>
      tOldE += noop(oldEdges())
      tNewE += noop(newEdges())
      tOld += noop(oldFull())
      tNew += noop(newFull())
    }
    def med(a: Seq[Double]) = a.sorted.apply((a.length - 1) / 2)
    def fmt(a: Seq[Double]) = a.map(x => f"$x%.2f").mkString(",")
    println(f"""{"dir":"$dir","old_edges_med":${med(tOldE.toSeq)}%.2f,"new_edges_med":${med(tNewE.toSeq)}%.2f,"old_full_med":${med(tOld.toSeq)}%.2f,"new_full_med":${med(tNew.toSeq)}%.2f,"old_full":[${fmt(tOld.toSeq)}],"new_full":[${fmt(tNew.toSeq)}],"old_edges":[${fmt(tOldE.toSeq)}],"new_edges":[${fmt(tNewE.toSeq)}]}""")
    spark.stop()
  }
}
