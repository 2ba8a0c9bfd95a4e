package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics on DataFrames — the Pregel shape
  * expressed relationally: per superstep, one join (ranks onto
  * edges) plus one aggregate (contributions by destination), both
  * hash-partitioned on the node id, so every iteration is a single
  * co-partitioned shuffle round. Complements the min-label-propagation
  * connected components in [[graft.llmdata.Dedup]].
  */
object Graph {

  /** PageRank with INTEGER-EXACT arithmetic (Page et al. 1999, the
    * public algorithm, on the un-normalized per-node form): ranks are
    * scaled longs, contributions are floor divisions, and the damping
    * update is
    *
    *   r'(v) = ((den-num)*scale + num * Σ_{u→v} (r(u) div deg(u))) div den
    *
    * — every step integer, so the whole trajectory is replayable
    * bit-for-bit by any engine (the q169 oracle unrolls the
    * iterations as CTEs). Floating-point PageRank would diverge
    * across engines in the last ulp and make the ranking
    * unverifiable; the quantization error is ≤ deg(u) ulps of 1/scale
    * per node per step — invisible at scale=1e12.
    *
    * Scale shape: edges and degrees are computed once and cached;
    * each of the `iters` supersteps is one join on the node id plus
    * one partial-aggregated groupBy(dst) — the canonical distributed
    * PageRank round. Nodes with no in-edges keep the base mass via
    * the left join. The node set is src ∪ dst, so SINK nodes (in-edges
    * only, common in directed graphs) get a rank row too: they receive
    * contributions and base mass but contribute nothing (deg 0 —
    * mass flowing into a sink stays there un-redistributed, the
    * un-normalized-form contract). Overflow contract: num * Σcontrib
    * must stay under 2^63, i.e. nodes * scale * num < 2^63 — at a
    * billion nodes drop scale to 1e8 (still 8 exact digits of rank).
    *
    * `edges` must carry long columns `src`, `dst` (pre-symmetrized by
    * the caller if the graph is undirected). Returns (node, rank).
    */
  def pageRankInt(edges: DataFrame, iters: Int,
      scale: Long = 1000000000000L, dampNum: Long = 85L,
      dampDen: Long = 100L): DataFrame = {
    require(iters >= 1, s"pageRankInt: iters $iters")
    require(dampNum > 0 && dampNum < dampDen,
      s"pageRankInt: damping $dampNum/$dampDen")
    // edges and degrees are read every superstep — pin both
    // (graft.Caches registry; the caller's Verify/Bench release hook
    // frees the blocks once results materialize)
    val e = graft.Caches.pin(
      edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst")))
    val deg = graft.Caches.pin(
      e.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg")))
    // node universe = src ∪ dst, so sinks keep a rank row
    val nodes = graft.Caches.pin(
      e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node"))).distinct())
    var ranks = nodes.select(col("node"), lit(scale).as("rank"))
    val base = (dampDen - dampNum) * scale
    for (_ <- 1 to iters) {
      val contribs = e
        .join(ranks.join(deg, "node"), e("src") === col("node"))
        .select(col("dst").as("node"),
          expr("rank div deg").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("csum"))
      ranks = nodes
        .join(contribs, Seq("node"), "left")
        .withColumn("__m",
          lit(base) + lit(dampNum) * coalesce(col("csum"), lit(0L)))
        .select(col("node"),
          expr(s"__m div ${dampDen}L").as("rank"))
    }
    ranks
  }
}
