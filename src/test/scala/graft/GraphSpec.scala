package graft

import org.apache.spark.sql.functions._

import graft.ext.Graph

/** Fixed-point PageRank: mass conservation, ranking, dangling
  * handling, and bit-determinism across partitionings.
  */
class GraphSpec extends SparkSpec {

  private def toy() = {
    import spark.implicits._
    // a -> b, a -> c, b -> c; c dangles
    val nodes = Seq("a", "b", "c").toDF("node")
    val edges = Seq(("a", "b"), ("a", "c"), ("b", "c")).toDF("src", "dst")
    (nodes, edges)
  }

  test("pagerank: sink collects rank, mass approximately conserved") {
    val (nodes, edges) = toy()
    val pr = Graph.pageRank(nodes, edges).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // c receives from both a and b plus dangling share -> highest;
    // a only gets base + dangling share -> lowest
    assert(pr("c") > pr("b") && pr("b") > pr("a"))
    val total = pr.values.sum
    // integer truncation loses a few units per round, never gains
    assert(total <= 1000000000L && total > 999999000L)
  }

  test("pagerank: bit-identical across partitionings (fixed-point)") {
    val (nodes, edges) = toy()
    val a = Graph.pageRank(nodes, edges).orderBy("node").collect().toSeq
    val b = Graph.pageRank(nodes.repartition(7), edges.repartition(5))
      .orderBy("node").collect().toSeq
    assert(a === b)
  }

  test("pagerank: all-dangling graph stays uniform") {
    import spark.implicits._
    val nodes = Seq("x", "y").toDF("node")
    val edges = Seq.empty[(String, String)].toDF("src", "dst")
    val pr = Graph.pageRank(nodes, edges, iters = 3).collect()
      .map(_.getLong(1)).distinct
    assert(pr.length === 1) // symmetric nodes keep identical rank
  }
}
