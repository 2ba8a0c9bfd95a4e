package graft

import graft.ops.Scd
import graft.streaming.Streams
import graft.streaming.Streams.{CdcChange, CdcRow}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CDC apply: batch latest-wins fold == sequential upsert/delete
  * folds == the streaming mapGroupsWithState operator under any
  * micro-batch slicing or arrival order.
  */
class CdcSpec extends SparkSuite {
  import spark.implicits._

  // base keys 1..5; feed exercises: double update (latest wins),
  // plain delete, delete-then-reinsert, insert of a new key,
  // untouched key, and an intra-seq tiebreak
  private def base: DataFrame =
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0),
      (4L, "d", 40.0), (5L, "e", 50.0)).toDF("k", "name", "bal")

  private def feed: DataFrame = Seq(
    ("U", 1L, 0L, 1L, "a", 11.0),
    ("U", 2L, 0L, 1L, "a2", 12.0),   // later seq wins for key 1
    ("D", 1L, 0L, 2L, "b", 20.0),    // key 2 deleted
    ("D", 1L, 0L, 3L, "c", 30.0),
    ("U", 2L, 0L, 3L, "c2", 33.0),   // key 3 reinserted after delete
    ("I", 1L, 0L, 6L, "f", 60.0),    // new key 6
    ("U", 3L, 1L, 5L, "e-lo", 51.0),
    ("U", 3L, 2L, 5L, "e-hi", 52.0)  // same seq: tie breaks, hi wins
  ).toDF("op", "seq", "tie", "k", "name", "bal")

  private def expected: Set[(Long, String, Double)] = Set(
    (1L, "a2", 12.0), (3L, "c2", 33.0), (4L, "d", 40.0),
    (5L, "e-hi", 52.0), (6L, "f", 60.0))

  private def asSet(df: DataFrame): Set[(Long, String, Double)] =
    df.collect().map(r => (r.getLong(0), r.getString(1),
      r.getDouble(2))).toSet

  test("applyChanges: latest change wins, deletes remove, reinserts " +
      "restore, untouched keys survive, intra-seq ties break on tie") {
    val got = Scd.applyChanges(base, feed, "k", "seq", "tie")
    assert(asSet(got.select("k", "name", "bal")) == expected)
  }

  test("applyChanges == folding the feed through upsert/delete one " +
      "seq at a time") {
    val seqs = feed.select("seq").distinct()
      .collect().map(_.getLong(0)).sorted
    val folded = seqs.foldLeft(base) { (state, s) =>
      // within one seq, apply ties in tie order (later tie wins by
      // overwriting), deletes after upserts of LOWER tie — here each
      // (seq, key) has either deletes or upserts, so order by tie
      val batchAll = feed.where(col("seq") === s)
      val ties = batchAll.select("tie").distinct()
        .collect().map(_.getLong(0)).sorted
      ties.foldLeft(state) { (st, t) =>
        val batch = batchAll.where(col("tie") === t)
        val dels = batch.where(col("op") === "D").select(col("k"))
        val ups = batch.where(col("op") =!= "D")
          .select(col("k"), col("name"), col("bal"))
        val afterDel = st.join(dels, Seq("k"), "left_anti")
        Scd.upsert(afterDel, ups, "k")
      }
    }
    assert(asSet(folded) == expected)
  }

  test("cdcApply batch form == applyChanges on an empty base " +
      "(JSON payload round-trips values exactly)") {
    val sch = new org.apache.spark.sql.types.StructType()
      .add("name", "string").add("bal", "double")
    val got = Streams.cdcApply(feed, "k", "seq", "tie", "op",
        Seq("name", "bal"))
      .toDF().where(!col("deleted"))
      .select(col("key").as("k"), from_json(col("payload"), sch).as("v"))
      .select(col("k"), col("v.name"), col("v.bal"))
    val emptyBase = base.where(lit(false))
    val batch = Scd.applyChanges(emptyBase, feed, "k", "seq", "tie")
    // streaming state sees no base rows, so compare against the
    // empty-base fold: latest non-deleted change per key
    assert(asSet(got) == asSet(batch.select("k", "name", "bal")))
  }

  test("cdcApply over a MemoryStream: two slicings and a shuffled " +
      "arrival order all converge to the batch state") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext =
      spark.sqlContext
    val sch = new org.apache.spark.sql.types.StructType()
      .add("name", "string").add("bal", "double")
    val rows = feed.collect().map(r => CdcChange(r.getLong(3),
      r.getLong(1), r.getLong(2), r.getString(0),
      s"""{"name":"${r.getString(4)}","bal":${r.getDouble(5)}}"""))

    def finalState(name: String,
        slices: Seq[Seq[CdcChange]]): Set[(Long, String, Double)] = {
      val in = MemoryStream[CdcChange]
      // cdcApply re-wraps payload via to_json(struct(...)) — feed it
      // the raw change columns, un-JSONed first
      val q2 = {
        val st = new org.apache.spark.sql.types.StructType()
          .add("name", "string").add("bal", "double")
        in.toDF().select(col("key").as("k"), col("seq"), col("tie"),
          col("op"), from_json(col("payload"), st).as("v"))
          .select(col("k"), col("seq"), col("tie"), col("op"),
            col("v.name").as("name"), col("v.bal").as("bal"))
      }
      val run = Streams.cdcApply(q2, "k", "seq", "tie", "op",
          Seq("name", "bal"))
        .toDF()
        .writeStream.outputMode("update").format("memory")
        .queryName(name).start()
      slices.foreach { s => in.addData(s); run.processAllAvailable() }
      run.stop()
      // final table = max-(seq, tie) emission per key, non-deleted
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("key"))
        .orderBy(col("seq").desc, col("tie").desc)
      spark.table(name)
        .withColumn("__rn", row_number().over(w))
        .where(col("__rn") === 1 && !col("deleted"))
        .select(col("key"), from_json(col("payload"), sch).as("v"))
        .select(col("key"), col("v.name"), col("v.bal"))
        .collect().map(r => (r.getLong(0), r.getString(1),
          r.getDouble(2))).toSet
    }

    val inOrder = finalState("cdc_s1",
      Seq(rows.take(3).toSeq, rows.slice(3, 6).toSeq, rows.drop(6).toSeq))
    val shuffled = finalState("cdc_s2",
      Seq(Seq(rows(7), rows(2)), Seq(rows(5), rows(1), rows(4)),
        Seq(rows(0), rows(6), rows(3))))
    val oneShot = finalState("cdc_s3", Seq(rows.toSeq))
    assert(inOrder == expected.filter(_._1 != 4L)) // key 4 never in feed
    assert(shuffled == inOrder && oneShot == inOrder)
  }
}
