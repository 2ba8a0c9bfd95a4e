package graft

import graft.ops.Graph
import org.apache.spark.sql.functions._

/** Integer-exact PageRank: hand-computed trajectories on tiny graphs
  * (the same arithmetic the q169 oracle unrolls as CTEs).
  */
class GraphSpec extends SparkSuite {
  import spark.implicits._

  private def ranks(edges: Seq[(Long, Long)], iters: Int,
      scale: Long = 1000L): Map[Long, Long] = {
    val df = edges.toDF("src", "dst")
    val got = Graph.pageRankInt(df, iters, scale = scale)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.Caches.release()
    got
  }

  test("symmetric 2-cycle is a fixed point at full mass") {
    // 1 <-> 2: each node's contribution is its whole rank (deg 1),
    // so r' = (15*1000 + 85*1000) div 100 = 1000 forever
    val got = ranks(Seq((1L, 2L), (2L, 1L)), iters = 4)
    assert(got == Map(1L -> 1000L, 2L -> 1000L))
  }

  test("star graph: hub accumulates, leaves equalize — exact " +
      "integer trajectory") {
    // directed: 1->3, 2->3, 3->1 (hub 3 has two in-edges)
    // deg: 1:1, 2:1, 3:1
    // iter1: c(3) = 1000+1000 = 2000 -> r3 = (150+170000/100? no:
    //   r3 = (15000 + 85*2000) div 100 = 1850
    //   c(1) = 1000 -> r1 = (15000 + 85000) div 100 = 1000
    //   2 has no in-edge -> r2 = 15000 div 100 = 150
    val it1 = ranks(Seq((1L, 3L), (2L, 3L), (3L, 1L)), iters = 1)
    assert(it1 == Map(1L -> 1000L, 2L -> 150L, 3L -> 1850L))
    // iter2: c(3) = 1000 + 150 = 1150 -> r3 = (15000+97750) div 100
    //   = 1127; c(1) = 1850 -> r1 = (15000+157250) div 100 = 1722
    //   r2 = 150
    val it2 = ranks(Seq((1L, 3L), (2L, 3L), (3L, 1L)), iters = 2)
    assert(it2 == Map(1L -> 1722L, 2L -> 150L, 3L -> 1127L))
  }

  test("sink nodes (in-edges only) get rank rows and keep the mass " +
      "flowing into them") {
    // directed chain 1 -> 2 -> 3; node 3 is a pure sink (no out-edge).
    // deg: 1:1, 2:1; nodes = {1,2,3}.
    // iter1: c(2) = 1000 -> r2 = (15000 + 85000) div 100 = 1000
    //        c(3) = 1000 -> r3 = 1000; 1 no in-edge -> r1 = 150
    val it1 = ranks(Seq((1L, 2L), (2L, 3L)), iters = 1)
    assert(it1 == Map(1L -> 150L, 2L -> 1000L, 3L -> 1000L))
    // iter2: c(2) = 150 -> r2 = (15000 + 12750) div 100 = 277
    //        c(3) = 1000 -> r3 = 1000 (sink receives, contributes 0)
    val it2 = ranks(Seq((1L, 2L), (2L, 3L)), iters = 2)
    assert(it2 == Map(1L -> 150L, 2L -> 277L, 3L -> 1000L))
  }

  test("triangleCounts: K4 gives every node 3, pendant edges none, " +
      "duplicate/reversed/self-loop edges don't inflate") {
    import spark.implicits._
    // K4 on 1..4 (+ dup, reverse, self-loop noise) + pendant 4-5
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (2L, 1L), (1L, 2L), (3L, 3L), (4L, 5L))
      .toDF("src", "dst")
    val got = Graph.triangleCounts(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.Caches.release()
    // K4 has C(4,3)=4 triangles; each node sits in 3 of them
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L),
      s"got $got")
  }

  test("commonNeighbors: counts shared neighbors, excludes already-" +
      "adjacent pairs, census guard trips on a hub") {
    import spark.implicits._
    // nodes 1,2 share nbrs 10,20,30; nodes 1,3 share 10 only;
    // 1-2 are ALSO directly adjacent (1 -> nbr 2? no: adjacency is
    // node->nbr; make 1 adjacent to 2 via (1, 2))
    val adj = Seq((1L, 10L), (1L, 20L), (1L, 30L), (2L, 10L),
      (2L, 20L), (2L, 30L), (3L, 10L), (1L, 2L))
      .toDF("node", "nbr")
    val got = Graph.commonNeighbors(adj, minCommon = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        r.getLong(2)).toMap
    graft.Caches.release()
    // (1,2) share 3 but are adjacent (1 -> nbr 2) -> excluded
    // (1,3) share {10}; (2,3) share {10}
    assert(got == Map((1L, 3L) -> 1L, (2L, 3L) -> 1L), s"got $got")
    val ex = intercept[IllegalArgumentException] {
      Graph.commonNeighbors(
        (1L to 50L).map((_, 99L)).toDF("node", "nbr"),
        minCommon = 1L, maxDegree = 10)
    }
    graft.Caches.release()
    assert(ex.getMessage.contains("prune hubs"))
  }

  test("commonNeighbors hub policies: drop and sample run where the " +
      "guard refuses; both answers hold the documented subset " +
      "relation to exact; sample keeps coordinated low-hash nodes") {
    import spark.implicits._
    // hub 99 touches everyone; selective nbrs 10 (1,2) and 20 (1,2),
    // 30 (2,3). Exact (no cap): (1,2)->3, (1,3)->1, (2,3)->2.
    val adj = (Seq((1L, 10L), (2L, 10L), (1L, 20L), (2L, 20L),
      (2L, 30L), (3L, 30L)) ++ (1L to 12L).map((_, 99L)))
      .toDF("node", "nbr")
    val exact = Graph.commonNeighbors(adj, minCommon = 1L,
        maxDegree = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        r.getLong(2)).toMap
    graft.Caches.release()
    // guard refuses at maxDegree = 10 ...
    intercept[IllegalArgumentException] {
      Graph.commonNeighbors(adj, minCommon = 1L, maxDegree = 10)
    }
    graft.Caches.release()
    // ... drop runs: hub 99 dropped, every score = exact - 1 hub
    // contribution; hubs-only pairs (e.g. (4,5)) vanish
    val dropped = Graph.commonNeighbors(adj, minCommon = 1L,
        maxDegree = 10, hubPolicy = "drop")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        r.getLong(2)).toMap
    graft.Caches.release()
    assert(dropped == Map((1L, 2L) -> 2L, (2L, 3L) -> 1L),
      s"got $dropped")
    assert(dropped.keySet.subsetOf(exact.keySet))
    assert(dropped.forall { case (k, v) => v <= exact(k) })
    // ... sample at cap 4 keeps each neighbor's 4 lowest-hash nodes
    // (coordinated: hub 99 keeps the SAME low-hash nodes any other
    // hub would) — subset relation holds, and a pair of two kept
    // nodes retains the hub contribution
    val sampled = Graph.commonNeighbors(adj, minCommon = 1L,
        maxDegree = 4, hubPolicy = "sample")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        r.getLong(2)).toMap
    graft.Caches.release()
    assert(sampled.keySet.subsetOf(exact.keySet), s"got $sampled")
    assert(sampled.forall { case (k, v) => v <= exact(k) })
    // the 4 lowest-hash nodes of hub 99 pair through it
    def h(n: Long) = ((n % 1000000007L) * 2654435761L + 42L) %
      1000000007L
    val kept99 = (1L to 12L).sortBy(n => (h(n), n)).take(4).toSet
    val hubPairs = for { a <- kept99; b <- kept99 if a < b }
      yield (a, b)
    assert(hubPairs.forall(sampled.contains),
      s"kept $kept99 pairs missing from $sampled")
  }

  test("linkScores: hand-computed Adamic-Adar and resource-allocation " +
      "quantized sums, hub discount visible, adjacency excluded") {
    import spark.implicits._
    // shared neighbors: z=10 touches nodes {1,2,3} (deg 3),
    // z=20 touches {1,2} (deg 2); pair (1,2) shares both,
    // (1,3)/(2,3) share z=10 only; (1,2) also directly adjacent
    val adj = Seq((1L, 10L), (2L, 10L), (3L, 10L), (1L, 20L),
      (2L, 20L), (1L, 2L)).toDF("node", "nbr")
    val got = Graph.linkScores(adj, minCommon = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    graft.Caches.release()
    // nbr 2 (from the direct edge (1,2)) has deg 1 -> no weight row;
    // deg(10)=3, deg(20)=2
    val aa3 = math.floor(1e6 / math.log(3.0)).toLong // 910239
    val aa2 = math.floor(1e6 / math.log(2.0)).toLong // 1442695
    val ra3 = 1000000000000L / 3
    val ra2 = 1000000000000L / 2
    // (1,2) excluded: directly adjacent
    assert(got == Map(
      (1L, 3L) -> ((1L, aa3, ra3)),
      (2L, 3L) -> ((1L, aa3, ra3))), s"got $got")
    // un-exclude: drop the direct edge; (1,2) now scores BOTH
    // neighbors, and the hub (deg-3) counts for less than deg-2
    val adj2 = Seq((1L, 10L), (2L, 10L), (3L, 10L), (1L, 20L),
      (2L, 20L)).toDF("node", "nbr")
    val got2 = Graph.linkScores(adj2, minCommon = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(3), r.getLong(4)))).toMap
    graft.Caches.release()
    assert(got2 == Map((1L, 2L) -> ((aa3 + aa2, ra3 + ra2))),
      s"got $got2")
    assert(aa2 > aa3 && ra2 > ra3) // the hub discount
  }

  test("kHopDistances: min hop distance, settled nodes never " +
      "re-labelled, unreachable nodes absent") {
    import spark.implicits._
    // chain 1->2->3->4->5 plus shortcut 1->4; seed {1}
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 4L))
      .toDF("src", "dst")
    val seeds = Seq(1L).toDF("node")
    val got = Graph.kHopDistances(edges, seeds, k = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.Caches.release()
    // 4 is 1 hop via the shortcut (not 3 via the chain); 5 is 2
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 1L,
      5L -> 2L), s"got $got")
    // k=1: only direct neighbors
    val k1 = Graph.kHopDistances(edges, seeds, k = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.Caches.release()
    assert(k1 == Map(1L -> 0L, 2L -> 1L, 4L -> 1L))
  }

  test("kCore: multi-round peel reaches the unique core, degrees " +
      "are in-core not original, k above degeneracy empties") {
    import spark.implicits._
    // triangle 1-2-3 with pendant chain 3-4-5: k=2 peels 5 (deg 1),
    // then 4 (deg 1 after round 1) — two genuine rounds — leaving
    // the triangle with in-core degree 2 each (node 3's original
    // degree was 3)
    val half = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
    val edges = (half ++ half.map(_.swap)).toDF("src", "dst")
    val got = Graph.kCore(edges, k = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 2L), s"got $got")
    // k=3: the triangle can't sustain min degree 3 -> empty
    assert(Graph.kCore(edges, k = 3).count() == 0L)
    // k=1: nothing peels; original degrees survive
    val k1 = Graph.kCore(edges, k = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(k1 == Map(1L -> 2L, 2L -> 2L, 3L -> 3L, 4L -> 2L,
      5L -> 1L), s"got $k1")
  }

  test("floor division quantization is exact, not rounded") {
    // 1->2 and 1->3 (deg 1 = 2): contribution is 1001 div 2 = 500
    // each (not 500.5); 2,3 -> r = (15000 + 85*500) div 100 = 575
    val got = ranks(Seq((1L, 2L), (1L, 3L), (2L, 1L), (3L, 1L)),
      iters = 1, scale = 1001L)
    // c(1) = 1001 + 1001 = 2002 -> r1 = (15015 + 85*2002) div 100 =
    //   (15015 + 170170) div 100 = 1851 (185185 div 100, floored)
    assert(got(2L) == (15L * 1001L + 85L * (1001L / 2)) / 100L)
    assert(got(3L) == got(2L))
    assert(got(1L) == (15L * 1001L + 85L * 2002L) / 100L)
  }

  test("clusteringCoeff: triangle nodes 1.0, hub with pendant " +
      "1/3 ppm, degree-1 excluded, triangle-free square all zero") {
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
      .toDF("src", "dst")
    val got = Graph.clusteringCoeff(g)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == Map(
      1L -> ((2L, 1L, 1000000L)), 2L -> ((2L, 1L, 1000000L)),
      3L -> ((3L, 1L, 333333L))), s"got $got")
    val sq = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
      .toDF("src", "dst")
    val z = Graph.clusteringCoeff(sq)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(z == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L),
      s"got $z")
  }

  test("assortativity: star graph is exactly -1; cycle-with-chord " +
      "hand-computes to -2/3") {
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("src", "dst")
    val rs = Graph.assortativity(star).collect().head
    assert(rs.getLong(0) == 4L && rs.getLong(1) == 3L)
    assert(rs.getDouble(2) == -1.0, s"star r ${rs.getDouble(2)}")
    // square 1-2-3-4 plus chord 1-3: degs 1,3 -> 3; 2,4 -> 2
    // m=10, sx=sy=26, sxy=66, sxx=syy=70 -> r = -16/24 = -0.666667
    val g = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))
      .toDF("src", "dst")
    val rg = Graph.assortativity(g).collect().head
    assert(rg.getLong(0) == 4L && rg.getLong(1) == 5L)
    assert(rg.getDouble(2) == -0.666667, s"r ${rg.getDouble(2)}")
  }

  test("labelPropagation: two triangles with one bridge separate " +
      "into their own min-label communities; dirty edges don't " +
      "change the result") {
    val clean = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L))
    val got = Graph.labelPropagation(clean.toDF("src", "dst"), 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.Caches.release()
    // hand rounds (min-label argmax): {1,2,3} -> 1, {4,5,6} -> 3
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 3L, 5L -> 3L, 6L -> 3L), s"got $got")
    val dirty = clean ++ Seq((2L, 1L), (3L, 3L), (1L, 2L)) // rev/self/dup
    val got2 = Graph.labelPropagation(dirty.toDF("src", "dst"), 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.Caches.release()
    assert(got2 == got)
    // canonical = true on an ALREADY symmetric-distinct loop-free
    // set replays the default path bit-for-bit (the q328 fixture
    // contract: skipping re-canonicalization must be an identity)
    val sym = clean ++ clean.map { case (a, b) => (b, a) }
    val got3 = Graph.labelPropagation(sym.toDF("src", "dst"), 3,
      canonical = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.Caches.release()
    assert(got3 == got)
  }

  test("pprInt: integer-exact hand rounds on a path graph — teleport " +
      "mass stays on the seed, propagation reaches 2 hops in 2 " +
      "rounds, unreachable components stay at rank 0") {
    // path 1-2-3 (symmetrized) + disconnected pair 4-5; seed {1}
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L),
      (4L, 5L), (5L, 4L)).toDF("src", "dst")
    val sources = Seq(1L).toDF("node")
    val got = Graph.pprInt(edges, sources, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.Caches.release()
    // r0 = S on seed; r1(1)=15e12/100, r1(2)=85*S/100;
    // r2(1)=(15e12+85*(850e9/2))/100, r2(2)=85*150e9/100,
    // r2(3)=85*425e9/100; 4,5 never reached
    assert(got == Map(
      1L -> 511250000000L, 2L -> 127500000000L, 3L -> 361250000000L,
      4L -> 0L, 5L -> 0L), s"got $got")
  }
}
