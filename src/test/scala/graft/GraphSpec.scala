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
}
