package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge lists — PageRank as the
  * representative fixed-iteration algorithm (the training-corpus use:
  * authority-weighting documents by citation/link structure before
  * sampling).
  *
  * Arithmetic is FIXED-POINT: ranks are BIGINT micro-units (`scale` =
  * 1e9 ≈ total mass), per-edge contributions are integer division
  * `pr div outdeg`, damping is `(85 * x) div 100`. Integer sums are
  * exact and order-independent, so the result is bit-identical across
  * partitionings, retries, and engines — a distributed float PageRank
  * can never hash-match a serial oracle, a fixed-point one must.
  * Truncation loses < 1 unit per edge per round of mass, irrelevant for
  * ranking (and identically reproduced by the oracle's `//`).
  *
  * Scale shape: each round is one edges⋈ranks join shuffling (node,
  * contrib) pairs + one groupBy — never adjacency lists; the dangling
  * mass is a 1-row aggregate cross-joined back (broadcast, J3 pattern,
  * no driver collect); each round's ranks are `localCheckpoint`ed so
  * the plan stays O(1) per round (see [[Clusters]] for why). Ranks are
  * O(|nodes|), edges stream through each round.
  */
object Graph {

  /** @param nodes (node) — one row per vertex, must cover every edge
    *              endpoint
    * @param edges (src, dst) — distinct directed edges
    * @return (node, pr) — BIGINT fixed-point rank, sum ≈ scale
    */
  def pageRank(nodes: DataFrame, edges: DataFrame, iters: Int = 5,
      scale: Long = 1000000000L): DataFrame = {
    val spark = nodes.sparkSession
    // materialize both caller plans ONCE — edges appears on both sides
    // of the outdeg join, nodes in the dangling set, the initial ranks
    // AND every round's merge; an expensive upstream plan must not run
    // iters+3 times
    val nd = nodes.localCheckpoint()
    val n = nd.count()
    val base = 15L * scale / (100L * n)
    val ed = edges.localCheckpoint()
    // out-degree is static: join it onto the edge list ONCE, so each
    // round's only edge-side work is the broadcast rank lookup
    val e = ed
      .join(ed.groupBy(col("src")).agg(count(lit(1)).as("outdeg")), "src")
      .localCheckpoint()
    // the dangling set (no out-edges) is static too
    val dangNodes = nd.join(ed.select(col("src").as("node")).distinct(),
        Seq("node"), "left_anti")
      .localCheckpoint()
    var pr = nd.select(col("node"), lit(scale / n).as("pr"))
      .localCheckpoint()
    // each round is ONE shuffle (the inflow groupBy of (dst, contrib)
    // pairs); ranks broadcast to the edge scan — O(|nodes|) rows, the
    // natural broadcast side of a power-iteration (at web-graph node
    // counts, swap for a shuffle join on src / pre-bucketed edges)
    val saved = spark.conf.get("spark.sql.shuffle.partitions")
    val p = math.max(4L, math.min(saved.toLong, n / 50000L)).toString
    spark.conf.set("spark.sql.shuffle.partitions", p)
    try {
      for (_ <- 1 to iters) {
        val inflow = e
          .join(broadcast(pr.withColumnRenamed("node", "src")), "src")
          .select(col("dst").as("node"), expr("pr div outdeg").as("contrib"))
          .groupBy("node")
          .agg(sum(col("contrib")).as("infl"))
        // dangling mass spreads evenly: 1-row aggregate, broadcast
        // back — never collected on the driver
        val dang = pr.join(broadcast(dangNodes), Seq("node"), "left_semi")
          .agg(coalesce(sum(col("pr")), lit(0L)).as("_dm"))
        // inflow is O(|nodes|) — the same broadcast compromise as the
        // rank lookup above (at web-graph scale swap both for shuffle
        // joins on pre-bucketed node id)
        pr = nd.select("node")
          .join(broadcast(inflow), Seq("node"), "left")
          .crossJoin(broadcast(dang))
          .select(col("node"),
            (lit(base) + expr(
              s"(85 * (coalesce(infl, CAST(0 AS BIGINT)) + _dm div $n)) div 100"))
              .as("pr"))
          .localCheckpoint()
      }
      pr
    } finally spark.conf.set("spark.sql.shuffle.partitions", saved)
  }
}
