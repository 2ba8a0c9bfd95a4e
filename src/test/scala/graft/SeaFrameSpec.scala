package graft

import graft.frame.SeaFrame
import org.apache.spark.sql.functions._

/** Pipeline facade semantics (SURVEY §2.2/2.5/2.6): projection, IN
  * filters, positional subset under explicit order, sort re-derives
  * the order, seeded shuffle is a permutation, append unions by name.
  */
class SeaFrameSpec extends SparkSuite {
  import spark.implicits._

  private def pipe = SeaFrame.withSequence(
    Seq(("a", 3.0), ("b", 1.0), ("c", 2.0), ("d", 5.0), ("e", 4.0))
      .toDF("k", "v"), Seq(col("k").asc))

  test("keep projects and reorders (gdata.go:633-649)") {
    val f = pipe.keep(Seq("v", "k"))
    assert(f.dataColumns == Seq("v", "k"))
  }

  test("drop removes a field (gdata.go:611-630)") {
    assert(pipe.drop("v").dataColumns == Seq("k"))
  }

  test("whereIn filters typed equality (gdata.go:897-969)") {
    assert(pipe.whereIn("k", Seq("a", "c")).df.count() == 2)
  }

  test("subset selects by position under the explicit order " +
      "(gdata.go:852-895)") {
    val got = pipe.subset(Seq(0L, 2L, 4L)).result
      .orderBy("k").select("k").collect().map(_.getString(0)).toSeq
    assert(got == Seq("a", "c", "e"))
  }

  test("row takes a single positional row (gdata.go:818-849)") {
    assert(pipe.row(1).result.select("k").head().getString(0) == "b")
  }

  test("subset renumbers 0..k-1 honoring request order and duplicates " +
      "(gdata.go:852-895)") {
    val got = pipe.subset(Seq(4L, 0L, 4L))
    val byPos = got.df.orderBy(SeaFrame.SEQ)
      .select(SeaFrame.SEQ, "k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(byPos == Seq((0L, "e"), (1L, "a"), (2L, "e")))
    // positional ops see the fresh positions, not the stale ones
    assert(got.row(1).result.select("k").head().getString(0) == "a")
    assert(got.limit(2).df.count() == 2)
  }

  test("slice renumbers rows 0..n-1 like the reference " +
      "(gdata.go:306-419)") {
    val sliced = pipe.slice(col("v") > 2.0) // keeps a, d, e
    // positional ops now address the FILTERED set
    assert(sliced.row(0).result.select("k").head().getString(0) == "a")
    assert(sliced.row(2).result.select("k").head().getString(0) == "e")
    val seqs = sliced.df.orderBy(SeaFrame.SEQ).select(SeaFrame.SEQ)
      .collect().map(_.getLong(0)).toSeq
    assert(seqs == Seq(0L, 1L, 2L))
  }

  test("sort re-derives the sequence (gdata.go:421-493)") {
    val sorted = pipe.sort("v")
    val got = sorted.df.orderBy(SeaFrame.SEQ).select("k")
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("b", "c", "a", "e", "d"))
    // positional ops now follow value order
    assert(sorted.row(0).result.select("k").head().getString(0) == "b")
  }

  test("sortedness metadata: set by sort, cleared by shuffle/slice/" +
      "append (gdata.go:496-507)") {
    assert(!pipe.isSorted && pipe.sortField == "")
    val sorted = pipe.sort("v")
    assert(sorted.isSorted && sorted.sortField == "v")
    assert(sorted.sortedBy.contains("v" -> true))
    assert(pipe.sort("v", ascending = false).sortedBy
      .contains("v" -> false))
    assert(!sorted.shuffle(1L).isSorted)
    assert(!sorted.slice(col("v") > 2.0).isSorted)
    assert(!sorted.append(pipe).isSorted)
    // projections keep the flag (the reference's Keep/Drop don't
    // touch sortField)
    assert(sorted.keep(Seq("v")).isSorted)
  }

  test("shuffle is a seeded permutation (gdata.go:506-510)") {
    val sh = pipe.shuffle(seed = 7)
    val ks = sh.result.select("k").collect().map(_.getString(0)).toSet
    assert(ks == Set("a", "b", "c", "d", "e"))
    // deterministic under the same seed
    val again = pipe.shuffle(seed = 7).df.orderBy(SeaFrame.SEQ)
      .select("k").collect().map(_.getString(0)).toSeq
    val first = sh.df.orderBy(SeaFrame.SEQ)
      .select("k").collect().map(_.getString(0)).toSeq
    assert(again == first)
  }

  test("append unions by name, drops right extras, extends the " +
      "sequence (pipeline.go:429-464)") {
    val extra = SeaFrame.withSequence(
      Seq(("x", 9.0, "junk")).toDF("k", "v", "extra"),
      Seq(col("k").asc))
    val appended = pipe.append(extra)
    assert(appended.df.count() == 6)
    assert(appended.dataColumns == Seq("k", "v"))
    // appended row continues the sequence
    val last = appended.df.orderBy(col(SeaFrame.SEQ).desc).select("k")
      .head().getString(0)
    assert(last == "x")
  }

  test("append needs no count job: zip-known counts compose, and an " +
      "unknown-count left side plans a lazy max(seq)+1 offset") {
    // withSequence knows its count as a zip by-product
    assert(pipe.knownCount.contains(5L))
    val extra = SeaFrame.withSequence(
      Seq(("x", 9.0)).toDF("k", "v"), Seq(col("k").asc))
    val appended = pipe.append(extra)
    assert(appended.knownCount.contains(6L))
    // slice re-derives the sequence, so its count is re-known (and
    // correct, not stale); limit tightens it
    val sliced = pipe.slice(col("v") > 1.0)
    assert(sliced.knownCount.contains(sliced.df.count()))
    assert(pipe.limit(3).knownCount.contains(3L))
    // unknown left count: lazy scalar offset, same values
    val unknownLeft = pipe.copy(knownCount = None)
    val viaLazy = unknownLeft.append(extra)
    assert(viaLazy.knownCount.isEmpty)
    val a = appended.df.orderBy(SeaFrame.SEQ).collect().map(_.toSeq)
    val b = viaLazy.df.orderBy(SeaFrame.SEQ).collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }

  test("append rejects a right side missing fields") {
    val bad = SeaFrame(Seq(("z")).toDF("k"))
    intercept[IllegalArgumentException] { pipe.append(bad) }
  }

  test("topK orders by count then value (data.go:815-837)") {
    val f = SeaFrame(Seq("a", "a", "b", "c", "c", "c").toDF("x"))
    val top = f.topK("x", 2).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(top == Seq(("c", 3L), ("a", 2L)))
  }

  test("whereIn matches typed date equality (ch.go:539-550)") {
    val df = Seq(
      (java.sql.Date.valueOf("2023-03-01"), "a"),
      (java.sql.Date.valueOf("2023-03-02"), "b"),
      (java.sql.Date.valueOf("2023-03-03"), "c")).toDF("d", "k")
    val got = SeaFrame(df)
      .whereIn("d", Seq(java.sql.Date.valueOf("2023-03-01"),
        java.sql.Date.valueOf("2023-03-03")))
      .df.select("k").collect().map(_.getString(0)).toSet
    assert(got == Set("a", "c"))
  }

  test("Slicers.and/or compose predicates (SlicerAnd/Or, " +
      "slicer.go:73-84)") {
    import graft.ops.Slicers
    val both = pipe.slice(Slicers.and(col("v") > 1.0, col("v") < 5.0))
    assert(both.df.count() == 3) // a(3), c(2), e(4)
    val either = pipe.slice(Slicers.or(col("v") === 1.0, col("v") === 5.0))
    assert(either.df.count() == 2) // b, d
  }

  test("reader read/seek/reset/countLines (GData reader, " +
      "gdata.go:653-722)") {
    val r = pipe.reader()
    assert(r.countLines() == 5)
    assert(r.read(2).map(_.getString(0)) == Seq("a", "b"))
    assert(r.pos == 2)
    r.seek(4) // forward skip
    assert(r.next().getString(0) == "e")
    r.seek(1) // backward -> re-open + skip
    assert(r.read(2).map(_.getString(0)) == Seq("b", "c"))
    r.reset()
    assert(r.pos == 0 && r.next().getString(0) == "a")
    intercept[java.util.NoSuchElementException] { r.seek(99) }
  }

  test("subset without an order errors (SURVEY 7.4 risk 1)") {
    val unordered = SeaFrame(Seq(("a", 1.0)).toDF("k", "v"))
    intercept[IllegalStateException] { unordered.subset(Seq(0L)) }
  }

  test("reader ranged read(from, n): a far window without consuming " +
      "the prefix; cursor unchanged; past-end truncates") {
    val r = pipe.reader()
    assert(r.read(1).map(_.getString(0)) == Seq("a")) // cursor -> 1
    // far window served by a positional plan, not forward iteration
    assert(r.read(3L, 2).map(_.getString(0)) == Seq("d", "e"))
    assert(r.pos == 1) // cursor untouched by the ranged read
    assert(r.next().getString(0) == "b") // sequential read continues
    // past-end: fewer rows, no error (read(n) semantics)
    assert(r.read(4L, 10).map(_.getString(0)) == Seq("e"))
    assert(r.read(99L, 3).isEmpty)
    // a declared-order (lazy) frame serves the same window
    val lr = lazyPipe.reader()
    assert(lr.read(3L, 2).map(_.getString(0)) == Seq("d", "e"))
  }

  // ---- lazy order declaration (SeaFrame.ordered) --------------------

  private def lazyPipe = SeaFrame.ordered(
    Seq(("a", 3.0), ("b", 1.0), ("c", 2.0), ("d", 5.0), ("e", 4.0))
      .toDF("k", "v"), Seq(col("k").asc))

  test("ordered: row/subset/limit equal the eager withSequence frame") {
    assert(lazyPipe.row(1).result.select("k").head().getString(0) ==
      pipe.row(1).result.select("k").head().getString(0))
    val lz = lazyPipe.subset(Seq(4L, 0L, 4L)).df.orderBy(SeaFrame.SEQ)
      .select("k").collect().map(_.getString(0)).toSeq
    val eg = pipe.subset(Seq(4L, 0L, 4L)).df.orderBy(SeaFrame.SEQ)
      .select("k").collect().map(_.getString(0)).toSeq
    assert(lz == eg)
    assert(lazyPipe.limit(3).df.orderBy("k").select("k").collect()
      .map(_.getString(0)).toSeq == Seq("a", "b", "c"))
  }

  test("ordered: positional access plans TakeOrdered, not a full sort " +
      "zip (the 100 TB shape: per-partition top-k + O(k) merge)") {
    val plan = lazyPipe.orderedPrefix(3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected a TakeOrdered plan, got:\n$plan")
    // and the zip it feeds sees only the prefix
    assert(lazyPipe.row(4).result.select("k").head().getString(0) == "e")
  }

  test("ordered: filters keep the declaration; re-sort stays lazy; " +
      "materializing ops agree with the eager frame") {
    val sliced = lazyPipe.slice(col("v") > 2.0) // a, d, e renumbered
    assert(sliced.pendingOrder.isDefined) // still lazy after filter
    assert(sliced.row(2).result.select("k").head().getString(0) == "e")
    val resorted = lazyPipe.sort("v")
    assert(resorted.pendingOrder.isDefined) // still lazy after sort
    assert(resorted.row(0).result.select("k").head().getString(0) == "b")
    // keep() materializes (keys may reference dropped columns)
    val kept = lazyPipe.keep(Seq("v", "k"))
    assert(kept.pendingOrder.isEmpty && kept.seqCol.isDefined)
    // append materializes both sides and extends the sequence
    val appended = lazyPipe.append(lazyPipe.shuffle(3L))
    assert(appended.df.count() == 10)
    // the reader streams by declared keys with no zip
    assert(lazyPipe.reader().read(2).map(_.getString(0)) == Seq("a", "b"))
  }
}
