package graft

import graft.ops.Joins
import org.apache.spark.sql.functions._

/** Join goldens from the reference (gdata_test.go:432-584): m:n cross
  * product, left default-fill, outer fill, float-key rejection,
  * left-wins duplicate columns.
  */
class JoinSpec extends SparkSuite {
  import spark.implicits._

  // left: Field1 = [a b c a b c e f g h] (gdata_test.go:432-473)
  private def left = Seq("a", "b", "c", "a", "b", "c", "e", "f", "g", "h")
    .zipWithIndex.map { case (k, i) => (k, i.toDouble, s"L$i") }
    .toDF("Field1", "Field0", "FieldNM")

  // right: Field1 = [a b c k a]
  private def right = Seq("a", "b", "c", "k", "a")
    .zipWithIndex.map { case (k, i) => (k, i.toDouble, s"R$i") }
    .toDF("Field1", "Field2", "FieldNM")

  test("inner join is the m:n cross product of equal keys " +
      "(gdata_test.go:474-490)") {
    val j = Joins.join(left, right, "Field1", "inner")
    // a: 2 left x 2 right = 4; b: 1x1; c: 2x1... left has a,a b,b c,c:
    // a:2x2=4, b:2x1=2, c:2x1=2 -> 8 rows (matches the reference's
    // 8-row inner golden)
    assert(j.count() == 8)
  }

  test("left join fills missing right side with defaults, not null " +
      "(gdata_test.go:492-506)") {
    val j = Joins.join(left, right, "Field1", "left",
      defaults = Map("Field2" -> 110.0))
    val unmatched = j.where(col("Field1").isin("e", "f", "g", "h"))
      .select("Field2").collect().map(_.getDouble(0)).toSeq
    assert(unmatched == Seq(110.0, 110.0, 110.0, 110.0))
  }

  test("outer join fills string defaults (gdata_test.go:526-584)") {
    val j = Joins.join(left, right, "Field1", "outer",
      defaults = Map("FieldNM" -> "XX"))
    // k exists only on the right; left-side fields get the default
    val kRow = j.where(col("Field1") === "k")
    assert(kRow.count() == 1)
    assert(kRow.select("FieldNM").head().getString(0) == "XX")
  }

  test("duplicate non-key columns: left wins (gdata.go:1216-1224)") {
    val j = Joins.join(left, right, "Field1", "inner")
    // FieldNM exists on both sides; the joined values are the left's
    val vals = j.select("FieldNM").collect().map(_.getString(0))
    assert(vals.forall(_.startsWith("L")))
  }

  test("float keys rejected (gdata.go:1486-1499)") {
    val ex = intercept[IllegalArgumentException] {
      Joins.join(left, right, "Field0",
        "inner")
    }
    assert(ex.getMessage.contains("float key"))
  }

  test("salted join matches plain join results (skew mitigation)") {
    val plain = Joins.join(left, right, "Field1", "inner")
      .select("Field1", "Field0", "Field2").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).sorted
    val salted = Joins.saltedJoin(left, right, "Field1", "inner", 4)
      .select("Field1", "Field0", "Field2").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).sorted
    assert(salted.toSeq == plain.toSeq)
  }

  test("asofJoin picks the latest right row at-or-before left time") {
    val trades = Seq((1, 10, "t10"), (1, 20, "t20"), (2, 15, "t15"))
      .toDF("k", "t", "tag")
    val quotes = Seq((1, 5, 100.0), (1, 12, 110.0), (1, 20, 120.0),
      (2, 99, 999.0)).toDF("k", "qt", "px")
    val j = Joins.asofJoin(trades, quotes, "k", "t", "qt",
      payload = Seq("px"))
    val got = j.select("tag", "asof_qt", "asof_px").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getDouble(2))).toSet
    // t10 -> quote@5; t20 -> quote@20 (inclusive); k=2 trade@15 has no
    // preceding quote -> dropped (inner as-of)
    assert(got == Set(("t10", 5, 100.0), ("t20", 20, 120.0)))
  }

  test("zero-value fills per kind (gdata.go:1322-1344)") {
    val l = Seq((1, "x")).toDF("k", "lv")
    val r = Seq((2, 5.5, "s", 7L)).toDF("k", "dv", "sv", "iv")
    val j = Joins.join(l, r, "k", "outer")
    val row1 = j.where(col("k") === 1).head()
    assert(row1.getDouble(j.columns.indexOf("dv")) == 0.0)
    assert(row1.getString(j.columns.indexOf("sv")) == "")
    assert(row1.getLong(j.columns.indexOf("iv")) == 0L)
  }

  test("semi/anti joins: existence filters, left columns only, " +
      "planned as LeftSemi/LeftAnti") {
    val l = Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "lv")
    val r = Seq((2, 9.0), (2, 8.0), (3, 7.0)).toDF("k", "rv")
    val semi = Joins.joinMulti(l, r, Seq("k"), "semi")
    assert(semi.columns.toSeq == Seq("k", "lv")) // right never leaks
    // a 1:n match must NOT duplicate left rows (semi != inner)
    assert(semi.collect().map(_.getInt(0)).sorted.toSeq == Seq(2, 3))
    val anti = Joins.joinMulti(l, r, Seq("k"), "anti")
    assert(anti.collect().map(_.getInt(0)).toSeq == Seq(1))
    val plan = semi.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), s"expected LeftSemi in:\n$plan")
  }

  test("joinMulti: composite key, left-wins dup drop, default fill, " +
      "float-key rejection per key") {
    val l = Seq((1, 10, "x", 1.0), (2, 20, "y", 2.0))
      .toDF("k1", "k2", "dup", "lv")
    val r = Seq((1, 10, "zz", 5.5), (9, 90, "ww", 6.6))
      .toDF("k1", "k2", "dup", "rv")
    val j = Joins.joinMulti(l, r, Seq("k1", "k2"), "left")
    assert(j.columns.count(_ == "dup") == 1) // left wins, right's dropped
    val m = j.where(col("k1") === 2).head()
    assert(m.getString(j.columns.indexOf("dup")) == "y")
    assert(m.getDouble(j.columns.indexOf("rv")) == 0.0) // filled, not null
    val ex = intercept[IllegalArgumentException] {
      Joins.joinMulti(l.withColumn("k2", col("k2").cast("double")),
        r.withColumn("k2", col("k2").cast("double")),
        Seq("k1", "k2"), "inner")
    }
    assert(ex.getMessage.contains("float key"))
  }

  test("fuzzyMatch: value-level pairs within the block, row counts " +
      "carried, cross-block true pairs honestly missed") {
    import spark.implicits._
    val df = Seq("red bolt", "red bolt", "red bolt", // 3 dup rows
      "red boat", // ED 1 from red bolt (a->l), same block
      "red carpet", // ED > 2 from both
      "ned bolt" // ED 1 from red bolt but block 'ned' -> not paired
    ).toDF("name")
    val got = Joins.fuzzyMatch(df, "name",
        v => split(v, " ").getItem(0), maxDist = 2)
      .orderBy("name_a", "name_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // one pair: duplication collapsed to the value census (n_a/n_b),
    // the cross-block near-dup is the documented blocking contract
    assert(got.toSeq == Seq(("red boat", "red bolt", 1L, 1L, 3L)))
  }

  test("fuzzyMatch: maxPerBlock census guard refuses a degenerate " +
      "blocking key before the quadratic join") {
    import spark.implicits._
    val df = (0 until 50).map(i => s"x $i").toDF("name")
    val ex = intercept[IllegalArgumentException] {
      Joins.fuzzyMatch(df, "name", _ => lit("one-block"), maxDist = 1,
        maxPerBlock = 10)
    }
    assert(ex.getMessage.contains("finer blocking key"))
  }

  test("fuzzyMatch/fuzzyMatchJw: empty or all-null input yields an " +
      "empty result, not an NPE in the census guard") {
    import spark.implicits._
    val empty = Seq.empty[String].toDF("name")
    val nulls = Seq(Option.empty[String], None).toDF("name")
    for (df <- Seq(empty, nulls)) {
      assert(Joins.fuzzyMatch(df, "name", substring(_, 1, 1),
        maxDist = 1).count() == 0L)
      assert(Joins.fuzzyMatchJw(df, "name", substring(_, 1, 1),
        minSim = 0.9).count() == 0L)
    }
  }

  test("fellegiSunter: hand-computed weight sums, null counts as " +
      "disagreement, decision bands, both-side block census") {
    import spark.implicits._
    import graft.ops.Linkage
    val ws = Linkage.fsWeights(Seq(("f", 0.9, 0.1)))
    val (wa, wd) = (ws.head._2, ws.head._3)
    assert(wa == math.floor(1e6 * math.log(9.0) / math.log(2.0)).toLong)
    assert(wd == math.floor(1e6 * math.log(1.0 / 9.0) /
      math.log(2.0)).toLong)
    assert(wa > 0 && wd < 0)
    val a = Seq((1L, "b1", "x", "p"), (2L, "b1", "y", null))
      .toDF("id", "blk", "name", "ph")
    val b = Seq((10L, "b1", "x", "p"), (20L, "b1", "z", "p"))
      .toDF("id", "blk", "name", "ph")
    val fields = Seq(("name", 0.9, 0.1), ("ph", 0.9, 0.1))
    val got = Linkage.fellegiSunter(a, b, "id", "blk", fields,
        upperQ = 2 * wa, lowerQ = 2 * wd)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getString(3)))).toMap
    // (1,10): both agree -> 2*wa = match; (1,20): name dis, ph agree
    // -> review; (2,10): name dis, ph NULL -> dis -> 2*wd non_match;
    // (2,20): name dis, ph NULL -> non_match
    assert(got == Map(
      (1L, 10L) -> ((2 * wa, "match")),
      (1L, 20L) -> ((wd + wa, "review")),
      (2L, 10L) -> ((2 * wd, "non_match")),
      (2L, 20L) -> ((2 * wd, "non_match"))), s"got $got")
    val dense = (1 to 100).map(i => (i.toLong, "b", s"n$i", "p"))
      .toDF("id", "blk", "name", "ph")
    val sparse = Seq((1L, "b", "n", "p")).toDF("id", "blk", "name", "ph")
    intercept[IllegalArgumentException] {
      Linkage.fellegiSunter(sparse, dense, "id", "blk", fields,
        upperQ = 1L, lowerQ = 0L, maxPerBlock = 10)
    }
  }
}
