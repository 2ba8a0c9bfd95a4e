package graft

import graft.streaming.EloStream
import org.apache.spark.sql.functions._

/** Streaming Elo: the single-group rating-table fold equals the
  * batch [[graft.ops.Preference.elo]] bit-for-bit under any
  * order-respecting micro-batch slicing (latest board = rows at the
  * max asof_ord). Out-of-order arrivals and hygiene cases mirror the
  * batch operator.
  */
class StreamingEloSpec extends SparkSuite {
  import spark.implicits._

  // a little tournament with upsets, repeat pairings and a late
  // entrant; ord unique so any contiguous slicing is order-respecting
  private val games: Vector[(Long, String, String)] = Vector(
    (1L, "A", "B"), (2L, "B", "C"), (3L, "A", "C"), (4L, "C", "B"),
    (5L, "B", "A"), (6L, "A", "B"), (7L, "D", "A"), (8L, "D", "B"),
    (9L, "C", "D"), (10L, "A", "D"), (11L, "B", "D"), (12L, "A", "C"))

  private def batchExpected: Set[(String, Long, Long, Long)] =
    graft.ops.Preference.elo(games.toDF("ts", "w", "l"),
        col("ts"), col("w"), col("l"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getLong(2), r.getLong(3))).toSet

  private def latestBoard(
      rows: Array[org.apache.spark.sql.Row])
      : Set[(String, Long, Long, Long)] = {
    val maxAsof = rows.map(_.getAs[Long]("asof_ord")).max
    rows.filter(_.getAs[Long]("asof_ord") == maxAsof)
      .map(r => (r.getAs[String]("item"), r.getAs[Long]("games"),
        r.getAs[Long]("wins"), r.getAs[Long]("rating_ppm"))).toSet
  }

  test("bounded one-pass fold equals Preference.elo exactly; " +
      "zero-sum holds; hygiene rows dropped like the batch op") {
    val dirty = games ++ Vector((13L, "E", "E")) // self-game dropped
    val out = EloStream.eloStream(dirty.toDF("ts", "w", "l"),
      "ts", "w", "l").toDF().collect()
    graft.Caches.release()
    assert(latestBoard(out) == batchExpected)
    val mass = latestBoard(out).toSeq.map(_._4).sum
    assert(mass == 4L * 1500000000L) // zero-sum over 4 items
  }

  test("readStream: two order-respecting slicings both equal the " +
      "batch board; out-of-order across triggers fails fast; " +
      "maxItems refuses mid-fold") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext =
      spark.sqlContext
    val expected = batchExpected

    def run(name: String, slices: Seq[Seq[(Long, String, String)]])
        : Set[(String, Long, Long, Long)] = {
      val in = MemoryStream[(Long, String, String)]
      val q = EloStream.eloStream(
          in.toDF().select(col("_1").as("ts"), col("_2").as("w"),
            col("_3").as("l")), "ts", "w", "l")
        .toDF()
        .writeStream.outputMode("update").format("memory")
        .queryName(name).start()
      slices.foreach { s => in.addData(s); q.processAllAvailable() }
      q.stop()
      latestBoard(spark.table(name).collect())
    }

    assert(run("elo_s1", Seq(games.take(5), games.slice(5, 9),
      games.drop(9))) == expected)
    assert(run("elo_s2", games.grouped(3).toSeq) == expected)

    // out-of-order: ord 3 arrives after ord 12 is folded
    val in = MemoryStream[(Long, String, String)]
    val q = EloStream.eloStream(
        in.toDF().select(col("_1").as("ts"), col("_2").as("w"),
          col("_3").as("l")), "ts", "w", "l")
      .toDF()
      .writeStream.outputMode("update").format("memory")
      .queryName("elo_ooo").start()
    in.addData(games)
    q.processAllAvailable()
    in.addData(Seq((3L, "A", "B")))
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.processAllAvailable()
    }
    assert(e.getMessage.contains("out-of-order") ||
      Option(e.getCause).exists(_.getMessage.contains("out-of-order")))
    q.stop()

    val big = (1L to 10L).map(i => (i, s"P$i", s"Q$i"))
    val e2 = intercept[Exception] {
      EloStream.eloStream(big.toDF("ts", "w", "l"), "ts", "w", "l",
        maxItems = 5).toDF().collect()
    }
    assert(e2.getMessage.contains("maxItems") ||
      Option(e2.getCause).exists(_.getMessage.contains("maxItems")))
    graft.Caches.release()
  }
}
