package graft

import graft.ops.Scd
import org.apache.spark.sql.functions._

/** SCD2 history building and keyed upsert (MERGE core): hand-computed
  * versions, unchanged-state collapse, whole-row update semantics.
  */
class ScdSpec extends SparkSuite {
  import spark.implicits._

  test("scd2: consecutive unchanged states collapse; transitions cut " +
      "versions with [from, to) intervals; last version open") {
    import java.sql.Timestamp
    def t(s: String) = Timestamp.valueOf(s)
    val ev = Seq(
      (1L, t("2024-01-01 10:00:00"), 1L, "a"),
      (1L, t("2024-01-01 11:00:00"), 2L, "a"), // unchanged -> collapse
      (1L, t("2024-01-01 12:00:00"), 3L, "b"), // transition
      (1L, t("2024-01-01 13:00:00"), 4L, "a"), // back again = NEW version
      (2L, t("2024-01-01 09:00:00"), 5L, "x"))
      .toDF("k", "ts", "eid", "state")
    val got = Scd.scd2(ev, "k", "ts", "eid", Seq("state"))
      .orderBy("k", "version").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getTimestamp(2).toString, Option(r.getTimestamp(3))
          .map(_.toString).orNull, r.getString(4)))
    assert(got.toSeq == Seq(
      (1L, 1L, "2024-01-01 10:00:00.0", "2024-01-01 12:00:00.0", "a"),
      (1L, 2L, "2024-01-01 12:00:00.0", "2024-01-01 13:00:00.0", "b"),
      (1L, 3L, "2024-01-01 13:00:00.0", null, "a"),
      (2L, 1L, "2024-01-01 09:00:00.0", null, "x")))
  }

  test("scd2: null attribute transitions are versions too (null-safe " +
      "change detection)") {
    import java.sql.Timestamp
    def t(s: String) = Timestamp.valueOf(s)
    val ev = Seq(
      (1L, t("2024-01-01 10:00:00"), 1L, Some("a")),
      (1L, t("2024-01-01 11:00:00"), 2L, None), // a -> null = transition
      (1L, t("2024-01-01 12:00:00"), 3L, None)) // null -> null = collapse
      .toDF("k", "ts", "eid", "state")
    val got = Scd.scd2(ev, "k", "ts", "eid", Seq("state"))
    assert(got.count() == 2)
  }

  test("upsert: whole-row replacement incl. nulls; unmatched keys " +
      "insert; untouched rows survive") {
    val target = Seq((1L, Some("old1"), 10.0), (2L, Some("old2"), 20.0))
      .toDF("k", "s", "v")
    val updates = Seq((2L, Option.empty[String], 99.0), // null REPLACES
      (3L, Some("new3"), 30.0)) // insert
      .toDF("k", "s", "v")
    val got = Scd.upsert(target, updates, "k")
      .orderBy("k").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)).orNull,
        r.getDouble(2)))
    assert(got.toSeq == Seq(
      (1L, "old1", 10.0),
      (2L, null, 99.0), // row-wins: the update's null is kept
      (3L, "new3", 30.0)))
  }

  test("upsert: mismatched schemas rejected") {
    val t1 = Seq((1L, "a")).toDF("k", "s")
    val t2 = Seq((1L, "a", 1.0)).toDF("k", "s", "v")
    val ex = intercept[IllegalArgumentException](Scd.upsert(t1, t2, "k"))
    assert(ex.getMessage.contains("schemas must match"))
  }

  test("diff: emits exactly I/U/D rows; applying the diff " +
      "reproduces the new snapshot") {
    val old = Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0),
      (4L, "d", 4.0)).toDF("k", "s", "v")
    val nw = Seq((1L, "a", 1.0), // unchanged -> absent from diff
      (2L, "B", 2.0), // updated
      (4L, "d", 40.0), // updated
      (5L, "e", 5.0)) // inserted; 3 deleted
      .toDF("k", "s", "v")
    val d = Scd.diff(old, nw, "k").orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getDouble(3)))
    assert(d.toSeq == Seq(("U", 2L, "B", 2.0), ("D", 3L, "c", 3.0),
      ("U", 4L, "d", 40.0), ("I", 5L, "e", 5.0)))
    // round trip: upsert the I/U rows, drop the D keys -> new
    val diffDf = Scd.diff(old, nw, "k")
    val applied = Scd.upsert(old,
        diffDf.where(col("op") =!= "D").drop("op"), "k")
      .join(diffDf.where(col("op") === "D").select(col("k")),
        Seq("k"), "left_anti")
    assert(applied.orderBy("k").collect().toSeq ==
      nw.orderBy("k").collect().toSeq)
  }

  test("data-quality report: planted violations counted per rule, " +
      "clean rules pass") {
    import graft.ops.DataQuality
    import graft.ops.DataQuality._
    val df = Seq(
      (Some(1L), Some(10.0), Some("A-1")),
      (Some(2L), Some(999.0), Some("B-2")), // out of range
      (Some(2L), Some(20.0), Some("bad")),  // dup key + regex fail
      (Option.empty[Long], Some(30.0), Option.empty[String]))
      .toDF("k", "v", "code")
    val dim = Seq(1L, 2L).toDF("dk")
    val got = DataQuality.report(df, Seq(
        NotNull("k"), InRange("v", 0.0, 100.0),
        Matches("code", "^[A-Z]-"), Unique(Seq("k")),
        RefIntegrity("k", dim, "dk")))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getInt(4))).toMap
    assert(got(("not_null", "k")) == ((4L, 1L, 0)))
    assert(got(("in_range", "v")) == ((4L, 1L, 0)))
    // regex fails: 'bad' and the null code
    assert(got(("matches", "code")) == ((4L, 2L, 0)))
    // unique over k: 3 non-null keys, 2 distinct -> 1 violation
    assert(got(("unique", "k")) == ((4L, 1L, 0)))
    // every non-null k exists in dim -> passes
    assert(got(("ref_integrity", "k")) == ((4L, 0L, 1)))
  }
}
