package graft

import graft.streaming.MhStream
import org.apache.spark.sql.functions._

/** Streaming Mantel-Haenszel: the single-group cell-table fold
  * equals the batch [[graft.ops.Experiment
  * .mantelHaenszelProgressive]] bit-for-bit under order-respecting
  * micro-batch slicings; pending strata (cumulative n < 2) stay out
  * of the pool until they qualify; on strict-operator-acceptable
  * input the LAST progressive row equals
  * [[graft.ops.Experiment.mantelHaenszel]]'s single row; guard
  * violations fail fast.
  */
class StreamingMhSpec extends SparkSuite {
  import spark.implicits._

  // 4 ingest buckets, 3 strata. Y has a single subject in bucket 1
  // (PENDING there — enters the pool at bucket 2); Z first appears
  // in bucket 3 with two subjects (qualifies immediately). Every
  // stratum ends with n >= 2, so the strict operator accepts the
  // full input and the last progressive row must equal its row.
  private val subjects: Vector[(Long, String, Boolean, Boolean)] =
    Vector(
      (1L, "X", true, true), (1L, "X", true, false),
      (1L, "X", false, true), (1L, "X", false, false),
      (1L, "Y", true, true),
      (2L, "Y", false, false), (2L, "Y", true, false),
      (2L, "X", true, true), (2L, "X", false, false),
      (3L, "Z", true, true), (3L, "Z", false, false),
      (3L, "Y", false, true),
      (4L, "X", true, false), (4L, "Z", false, true),
      (4L, "Z", true, true), (4L, "Y", true, true))

  private def obsDf = subjects.toDF("bid", "s", "e", "o")

  private type R = (Long, Long, Long, Long, Option[Double],
    Option[Double], Option[Double])

  private def asRows(rows: Array[org.apache.spark.sql.Row]): Seq[R] =
    rows.map { r =>
      def od(i: Int): Option[Double] =
        if (r.isNullAt(i)) None else Some(r.getDouble(i))
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        od(4), od(5), od(6))
    }.toSeq.sortBy(_._1)

  private def batchExpected: Seq[R] = {
    val out = asRows(graft.ops.Experiment.mantelHaenszelProgressive(
      obsDf, bucket = col("bid"), stratum = col("s"),
      exposed = col("e"), outcome = col("o")).collect())
    graft.Caches.release()
    out
  }

  test("bounded one-pass fold equals mantelHaenszelProgressive " +
      "exactly; pending stratum enters at its qualifying bucket; " +
      "last row equals the strict mantelHaenszel") {
    val expected = batchExpected
    val out = asRows(MhStream.mhStream(obsDf, "bid", "s", "e", "o")
      .toDF().collect())
    assert(out == expected)
    // bucket 1 pools X only (Y pending at n=1): n = 4
    assert(expected.head._1 == 1L && expected.head._2 == 1L &&
      expected.head._3 == 4L)
    // bucket 2: X(6) + Y(3) pooled
    assert(expected(1)._2 == 2L && expected(1)._3 == 9L)
    // last row == strict operator (all strata end with n >= 2)
    val strict = graft.ops.Experiment.mantelHaenszel(obsDf,
      stratum = col("s"), exposed = col("e"), outcome = col("o"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double]),
        Option(r.get(4)).map(_.asInstanceOf[Double]),
        Option(r.get(5)).map(_.asInstanceOf[Double]))).head
    graft.Caches.release()
    val last = expected.last
    assert((last._2, last._3, last._4, last._5, last._6, last._7)
      == strict)
  }

  test("no-qualifying-stratum buckets emit nothing") {
    // bucket 1 has only singletons -> no row; bucket 2 qualifies X
    val sparse = Vector(
      (1L, "X", true, true), (1L, "Y", false, true),
      (2L, "X", false, false))
      .toDF("bid", "s", "e", "o")
    val out = asRows(MhStream.mhStream(sparse, "bid", "s", "e", "o")
      .toDF().collect())
    val exp = asRows(graft.ops.Experiment.mantelHaenszelProgressive(
      sparse, col("bid"), col("s"), col("e"), col("o")).collect())
    graft.Caches.release()
    assert(out == exp)
    assert(out.map(_._1) == Seq(2L))
  }

  test("readStream: one-bucket-per-trigger and uneven slicings " +
      "both equal the batch progressive rows; out-of-order across " +
      "triggers fails fast") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext =
      spark.sqlContext
    val expected = batchExpected

    def run(name: String,
        slices: Seq[Seq[(Long, String, Boolean, Boolean)]]): Seq[R] = {
      val in = MemoryStream[(Long, String, Boolean, Boolean)]
      val q = MhStream.mhStream(
          in.toDF().select(col("_1").as("bid"), col("_2").as("s"),
            col("_3").as("e"), col("_4").as("o")),
          "bid", "s", "e", "o")
        .toDF()
        .writeStream.outputMode("append").format("memory")
        .queryName(name).start()
      slices.foreach { s => in.addData(s); q.processAllAvailable() }
      q.stop()
      asRows(spark.table(name).collect())
    }

    assert(run("mh_s1",
      subjects.groupBy(_._1).toSeq.sortBy(_._1).map(_._2)) == expected)
    // uneven but bucket-boundary-respecting: {1,2}, {3}, {4}
    assert(run("mh_s2", Seq(subjects.take(9), subjects.slice(9, 12),
      subjects.drop(12))) == expected)

    // bucket 2 arrives after bucket 4 is folded -> fail fast
    val in = MemoryStream[(Long, String, Boolean, Boolean)]
    val q = MhStream.mhStream(
        in.toDF().select(col("_1").as("bid"), col("_2").as("s"),
          col("_3").as("e"), col("_4").as("o")),
        "bid", "s", "e", "o")
      .toDF()
      .writeStream.outputMode("append").format("memory")
      .queryName("mh_ooo").start()
    in.addData(subjects)
    q.processAllAvailable()
    in.addData(Seq((2L, "X", true, true)))
    val ex = intercept[org.apache.spark.sql.streaming
      .StreamingQueryException] { q.processAllAvailable() }
    q.stop()
    assert(ex.getMessage.contains("out-of-order") ||
      Option(ex.getCause).exists(_.getMessage != null) &&
        ex.getCause.getMessage.contains("out-of-order"))
  }

  test("maxStrata refuses mid-fold") {
    val wide = (0 until 12).map(i =>
      (1L, s"s$i", true, true)).toDF("bid", "s", "e", "o")
    val ex = intercept[Exception] {
      MhStream.mhStream(wide, "bid", "s", "e", "o", maxStrata = 8)
        .toDF().collect()
    }
    assert(ex.getMessage.contains("maxStrata") ||
      Option(ex.getCause)
        .exists(c => c.getMessage != null &&
          c.getMessage.contains("maxStrata")))
  }

  test("progressive guards: strata and bucket censuses refuse " +
      "oversize keys") {
    val df = obsDf
    val e1 = intercept[IllegalArgumentException] {
      graft.ops.Experiment.mantelHaenszelProgressive(df, col("bid"),
        col("s"), col("e"), col("o"), maxStrata = 2L)
    }
    assert(e1.getMessage.contains("strata"))
    val e2 = intercept[IllegalArgumentException] {
      graft.ops.Experiment.mantelHaenszelProgressive(df, col("bid"),
        col("s"), col("e"), col("o"), maxBuckets = 3L)
    }
    graft.Caches.release()
    assert(e2.getMessage.contains("buckets"))
  }
}
