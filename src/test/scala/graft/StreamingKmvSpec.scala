package graft

import graft.llmdata.Sketches
import graft.streaming.Streams
import org.apache.spark.sql.functions._

/** Streaming KMV: the bounded fold equals the batch sketch
  * bit-for-bit under ANY micro-batch slicing or arrival order — the
  * invariance that makes q351's oracle simply q348's SQL.
  */
class StreamingKmvSpec extends SparkSuite {
  import spark.implicits._

  test("batch-mode fold equals Sketches.kmv exactly") {
    val df = (1L to 5000L).map(i => ("s" + (i % 3), i))
      .toDF("seg", "id")
    val batch = Sketches.kmv(df, "seg", col("id"), k = 64)
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getLong(2))).toSet
    val streamed = Streams.kmvSketchStream(df, "seg", "id", k = 64)
      .collect().map(c => (c.segment, c.rank, c.h)).toSet
    assert(streamed == batch)
  }

  test("readStream: two different slicings (one shuffled) both end " +
      "at the identical sketch == the batch sketch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext =
      spark.sqlContext
    val rows = (1L to 2000L).map(i => ("s" + (i % 2), i)).toVector
    val expected = Sketches.kmv(rows.toDF("seg", "id"), "seg",
        col("id"), k = 32)
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getLong(2))).toSet

    def finalSketch(name: String,
        slices: Seq[Seq[(String, Long)]]): Set[(String, Long, Long)] = {
      val in = MemoryStream[(String, Long)]
      val run = Streams.kmvSketchStream(
          in.toDF().select(col("_1").as("seg"), col("_2").as("id")),
          "seg", "id", k = 32)
        .toDF()
        .writeStream.outputMode("update").format("memory")
        .queryName(name).start()
      slices.foreach { s => in.addData(s); run.processAllAvailable() }
      run.stop()
      // Update mode re-emits the whole sketch each batch; the final
      // state is the LAST emission per (segment, rank)
      val t = spark.table(name).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .zipWithIndex
      t.groupBy(x => (x._1._1, x._1._2))
        .map { case (_, vs) => vs.maxBy(_._2)._1 }.toSet
    }

    val s1 = finalSketch("kmv_s1",
      Seq(rows.take(700), rows.slice(700, 1500), rows.drop(1500)))
    val shuffled = new scala.util.Random(11).shuffle(rows)
    val s2 = finalSketch("kmv_s2", Seq(shuffled.take(40),
      shuffled.drop(40)))
    assert(s1 == expected, "slicing 1 diverged from the batch sketch")
    assert(s2 == expected, "shuffled slicing diverged")
  }
}
