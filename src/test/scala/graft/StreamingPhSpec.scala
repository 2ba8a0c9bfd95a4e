package graft

import graft.streaming.Streams
import org.apache.spark.sql.functions._

/** Streaming Page–Hinkley: the six-long state fold equals the batch
  * closed form bit-for-bit under any order-respecting micro-batch
  * slicing — the invariance that makes q378's oracle simply q374's
  * SQL. Out-of-order arrivals fail fast.
  */
class StreamingPhSpec extends SparkSuite {
  import spark.implicits._

  private def ts(i: Int): java.sql.Timestamp =
    new java.sql.Timestamp(3600000L * i)

  private val rows: Vector[(String, java.sql.Timestamp, Long)] =
    (1 to 40).map { i =>
      val v = if (i <= 20) 10L + (i % 3) else 25L + (i % 4)
      ("a", ts(i), v)
    }.toVector ++ (1 to 25).map { i => ("b", ts(i), 7L) }.toVector

  private def batchExpected: Set[(String, Long, Long, Long, Long, Int)] =
    graft.functions.Stats.pageHinkley(
        rows.toDF("g", "t", "v"), "g", "t", "v",
        deltaQ = 500000L, lambdaQ = 5000000L)
      .collect().map(r => (r.getString(0),
        r.getTimestamp(1).getTime, r.getLong(2),
        r.getAs[Long]("ph_pos"), r.getAs[Long]("ph_neg"),
        r.getAs[Int]("alarm"))).toSet

  test("batch-mode fold equals Stats.pageHinkley exactly, alarms " +
      "fire on the level shift") {
    val streamed = Streams.pageHinkleyStream(
        rows.toDF("g", "t", "v"), "g", "t", "v",
        deltaQ = 500000L, lambdaQ = 5000000L)
      .collect().map(c => (c.series, c.ord.getTime, c.x,
        c.ph_pos, c.ph_neg, c.alarm)).toSet
    assert(streamed == batchExpected)
    assert(streamed.exists(_._6 == 1)) // the shift at i=21 alarms
  }

  test("readStream: two order-respecting slicings both equal the " +
      "batch trajectory; out-of-order arrival fails fast") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext =
      spark.sqlContext
    val expected = batchExpected

    def run(name: String,
        slices: Seq[Seq[(String, java.sql.Timestamp, Long)]])
        : Set[(String, Long, Long, Long, Long, Int)] = {
      val in = MemoryStream[(String, java.sql.Timestamp, Long)]
      val q = Streams.pageHinkleyStream(
          in.toDF().select(col("_1").as("g"), col("_2").as("t"),
            col("_3").as("v")),
          "g", "t", "v", deltaQ = 500000L, lambdaQ = 5000000L)
        .toDF()
        .writeStream.outputMode("update").format("memory")
        .queryName(name).start()
      slices.foreach { s => in.addData(s); q.processAllAvailable() }
      q.stop()
      spark.table(name).collect().map(r => (r.getString(0),
        r.getTimestamp(1).getTime, r.getLong(2), r.getLong(3),
        r.getLong(4), r.getInt(5))).toSet
    }

    // slicing respects per-series time order (rows is g-major,
    // t-ascending within each series; contiguous slices keep that)
    val s1 = run("ph_s1", Seq(rows.take(10), rows.slice(10, 45),
      rows.drop(45)))
    assert(s1 == expected)
    val s2 = run("ph_s2", rows.grouped(7).toSeq)
    assert(s2 == expected)

    val in = MemoryStream[(String, java.sql.Timestamp, Long)]
    val q = Streams.pageHinkleyStream(
        in.toDF().select(col("_1").as("g"), col("_2").as("t"),
          col("_3").as("v")),
        "g", "t", "v", deltaQ = 0L, lambdaQ = 1L)
      .toDF()
      .writeStream.outputMode("update").format("memory")
      .queryName("ph_ooo").start()
    in.addData(Seq(("a", ts(5), 1L)))
    q.processAllAvailable()
    in.addData(Seq(("a", ts(3), 1L))) // regresses in time
    val err = intercept[org.apache.spark.sql.streaming
      .StreamingQueryException] { q.processAllAvailable() }
    assert(err.getMessage.contains("out-of-order") ||
      Option(err.getCause).exists(_.getMessage != null) )
    q.stop()
  }
}
