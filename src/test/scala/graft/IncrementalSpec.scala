package graft

import graft.ops.Incremental
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance: merge-of-states must be
  * BIT-identical to from-scratch recompute, under any slicing and
  * any merge order (the monoid-state contract q171 rides).
  */
class IncrementalSpec extends SparkSuite {
  import spark.implicits._

  private def rows = (1 to 300).map(i =>
    (s"g${i % 3}", i * 0.1 + 0.01)).toDF("g", "v")

  private def finishSorted(st: org.apache.spark.sql.DataFrame) =
    Incremental.finish(st, Seq("g")).orderBy("g").collect().toSeq

  test("merge of any slicing equals from-scratch aggregate exactly") {
    val full = finishSorted(Incremental.aggState(rows, Seq("g"), "v"))
    // three different slicings, including an empty slice
    val slicings = Seq(
      Seq(col("v") < 10.0, col("v") >= 10.0),
      Seq(col("v") < 0.0, col("v") >= 0.0), // first slice empty
      Seq(expr("crc32(g) % 2 = 0 AND v < 15"),
        expr("crc32(g) % 2 = 0 AND v >= 15"),
        expr("crc32(g) % 2 != 0")))
    slicings.foreach { preds =>
      val states = preds.map(p =>
        Incremental.aggState(rows.where(p), Seq("g"), "v"))
      assert(finishSorted(Incremental.merge(states, Seq("g"))) == full,
        s"slicing $preds diverged")
      // merge order must not matter
      assert(finishSorted(Incremental.merge(states.reverse,
        Seq("g"))) == full)
    }
  }

  test("a group appearing only in the delta emerges after merge") {
    val base = Incremental.aggState(rows.where(col("g") =!= "g2"),
      Seq("g"), "v")
    val delta = Incremental.aggState(rows.where(col("g") === "g2"),
      Seq("g"), "v")
    val m = finishSorted(Incremental.merge(Seq(base, delta), Seq("g")))
    assert(m.map(_.getString(0)) == Seq("g0", "g1", "g2"))
    assert(m == finishSorted(Incremental.aggState(rows, Seq("g"), "v")))
  }
}
