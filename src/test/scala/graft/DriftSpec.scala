package graft

import graft.streaming.DriftMonitor
import graft.streaming.DriftMonitor.{DriftObs, DriftRow}
import org.apache.spark.sql.DataFrame

/** Fertility drift monitor: exact integer decision, batch == bounded
  * flatMapGroupsWithState == real MemoryStream under two different
  * micro-batch slicings.
  */
class DriftSpec extends SparkSuite {

  private def fixture: Seq[DriftObs] = Seq(
    // source A: stable fertility 2.0 for three buckets, then a +50%
    // jump in bucket 3 and a recovery in bucket 4.
    DriftObs("a", 0L, 100L, 200L),
    DriftObs("a", 1L, 50L, 101L), // 2.02 vs baseline 2.0 — inside 5%
    DriftObs("a", 2L, 80L, 160L),
    DriftObs("a", 3L, 100L, 300L), // 3.0 vs ~2.0 — drifted
    DriftObs("a", 4L, 60L, 122L),
    // source B: single bucket (no prior, never drifted), split into
    // two observation rows that must fold into one bucket.
    DriftObs("b", 0L, 10L, 35L),
    DriftObs("b", 0L, 10L, 37L))

  private def rows(df: DataFrame): Set[(String, Long, Long, Long, Long,
      Long, Boolean)] =
    df.collect().map(r => (r.getAs[String]("source"),
      r.getAs[Long]("batch_id"), r.getAs[Long]("batch_words"),
      r.getAs[Long]("batch_units"), r.getAs[Long]("prior_words"),
      r.getAs[Long]("prior_units"), r.getAs[Boolean]("drifted"))).toSet

  test("drifted: exact boundary semantics (strict outside, no FP)") {
    // baseline 2.0, tol 5/100: the open interval is (1.9, 2.1) ratios.
    // bu/bw = 2.1 exactly (21/10 vs prior 20/10) is NOT drift.
    assert(!DriftMonitor.drifted(10, 21, 10, 20, 5, 100))
    assert(!DriftMonitor.drifted(10, 19, 10, 20, 5, 100))
    // one unit beyond the cross-multiplied boundary flips it
    assert(DriftMonitor.drifted(100, 211, 10, 20, 5, 100))
    assert(DriftMonitor.drifted(100, 189, 10, 20, 5, 100))
    // no prior or empty bucket: never drifted
    assert(!DriftMonitor.drifted(10, 30, 0, 0, 5, 100))
    assert(!DriftMonitor.drifted(0, 0, 10, 20, 5, 100))
    // zero tolerance: any inequality at all is drift
    assert(DriftMonitor.drifted(10, 21, 10, 20, 0, 100))
    assert(!DriftMonitor.drifted(10, 20, 10, 20, 0, 100))
  }

  test("report: per-bucket fold, cumulative prior, exact alerts") {
    import spark.implicits._
    val got = DriftMonitor.report(fixture.toDS().toDF(), 5, 100)
    val m = got.collect().map { r =>
      (r.getAs[String]("source"), r.getAs[Long]("batch_id")) -> r
    }.toMap
    assert(m.size == 6)
    val a3 = m(("a", 3L))
    assert(a3.getAs[Boolean]("drifted"))
    assert(a3.getAs[Long]("prior_words") == 230L &&
      a3.getAs[Long]("prior_units") == 461L)
    assert(!m(("a", 0L)).getAs[Boolean]("drifted")) // no prior
    assert(m(("a", 0L)).isNullAt(m(("a", 0L)).fieldIndex("baseline")))
    assert(!m(("a", 1L)).getAs[Boolean]("drifted")) // 2.02 inside 5%
    // b's two rows folded into one bucket of (20, 72)
    val b0 = m(("b", 0L))
    assert(b0.getAs[Long]("batch_words") == 20L &&
      b0.getAs[Long]("batch_units") == 72L)
    assert(!b0.getAs[Boolean]("drifted"))
  }

  test("monitor over a bounded Dataset equals the batch report") {
    import spark.implicits._
    val batch = rows(DriftMonitor.report(fixture.toDS().toDF(), 5, 100))
    val st = rows(DriftMonitor.monitor(fixture.toDS(), 5, 100).toDF())
    assert(st == batch)
  }

  test("monitor over a MemoryStream: two micro-batch slicings both " +
      "equal the batch report (replay/slicing invariance)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext =
      spark.sqlContext
    val batch = rows(DriftMonitor.report(fixture.toDS().toDF(), 5, 100))

    def run(name: String, slices: Seq[Seq[DriftObs]]): Set[(String,
        Long, Long, Long, Long, Long, Boolean)] = {
      val in = MemoryStream[DriftObs]
      val q = DriftMonitor.monitor(in.toDS(), 5, 100)
        .writeStream.outputMode("append").format("memory")
        .queryName(name).start()
      slices.foreach { s => in.addData(s); q.processAllAvailable() }
      q.stop()
      rows(spark.table(name))
    }

    // slicing 1: one ingest bucket per trigger
    val byBucket = fixture.groupBy(o => (o.source, o.batch_id)).toSeq
      .sortBy(_._1._2).map(_._2)
    assert(run("t_drift_a", byBucket) == batch)
    // slicing 2: everything in a single trigger
    assert(run("t_drift_b", Seq(fixture)) == batch)
  }

  test("monitor state is two longs per source (resumes across " +
      "triggers without per-document retention)") {
    // the a3 verdict depends only on the folded prior (230, 461) —
    // feed a DIFFERENT per-document decomposition of the same prior
    // totals and the verdict is unchanged.
    val alt = Seq(DriftObs("a", 0L, 230L, 461L),
      DriftObs("a", 3L, 100L, 300L))
    import spark.implicits._
    val got = DriftMonitor.monitor(alt.toDS(), 5, 100).toDF()
      .collect().map(r => (r.getAs[Long]("batch_id"),
        r.getAs[Boolean]("drifted"))).toMap
    assert(got(3L))
  }
}
