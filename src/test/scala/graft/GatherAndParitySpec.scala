package graft

import graft.exprlang.Formula
import graft.frame.SeaFrame
import graft.ml.ModSpec
import graft.ops.{Gather, Joins}
import org.apache.spark.sql.functions._

/** Remaining reference-parity surfaces: index/range/one2Many, right
  * join, month-snap formulas, model persistence.
  */
class GatherAndParitySpec extends SparkSuite {
  import spark.implicits._

  test("index() gathers by position (data.go:641-660)") {
    val f = SeaFrame.withSequence(
      Seq(("a", 1L), ("b", 0L), ("c", 2L)).toDF("x", "idx"),
      Seq(col("x").asc))
    val out = Gather.index(f, "x", "idx")
    val got = out.orderBy("x").select("x_at_idx").collect()
      .map(_.getString(0)).toSeq
    assert(got == Seq("b", "a", "c"))
  }

  test("index() errors out of bounds") {
    val f = SeaFrame.withSequence(
      Seq(("a", 5L)).toDF("x", "idx"), Seq(col("x").asc))
    intercept[Exception] { Gather.index(f, "x", "idx").collect() }
  }

  test("index() smallIdxSet path equals the plain join and plans a " +
      "broadcast") {
    val f = SeaFrame.withSequence(
      (0 until 60).map(i => (f"r$i%02d", (i * 13 % 5).toLong))
        .toDF("x", "idx"),
      Seq(col("x").asc))
    val plain = Gather.index(f, "x", "idx")
      .orderBy("x").select("x_at_idx").collect().map(_.getString(0)).toSeq
    val pruned = Gather.index(f, "x", "idx", smallIdxSet = true)
    val got = pruned.orderBy("x").select("x_at_idx").collect()
      .map(_.getString(0)).toSeq
    assert(got == plain)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("range(a,b) is exclusive and direction-aware " +
      "(parser.go:682-723)") {
    val up = Gather.rangePipe(spark, 2, 6).result
      .orderBy("value").collect().map(_.getLong(0)).toSeq
    assert(up == Seq(2L, 3L, 4L, 5L))
    val down = Gather.rangePipe(spark, 6, 2)
    assert(down.df.count() == 4)
  }

  test("formula-surface range(): attach, scalar, 1-row expand, " +
      "mismatch (parser.go:682-723, parser_test.go:836-858)") {
    // length == rows: attaches positionally in seq order
    val f3 = Seq(("a", 0L), ("b", 1L), ("c", 2L)).toDF("x", "__seq")
    val up = Formula.addToPipe(f3, "r", "range(5, 8)", Some("__seq"))
    assert(up.orderBy("__seq").select("r").collect()
      .map(_.getLong(0)).toSeq == Seq(5L, 6L, 7L))
    // descending, with constant-folded arithmetic bounds
    val down = Formula.addToPipe(f3, "r", "range(2+1, 0)", Some("__seq"))
    assert(down.orderBy("__seq").select("r").collect()
      .map(_.getLong(0)).toSeq == Seq(3L, 2L, 1L))
    // length-1 range broadcasts as a scalar
    val sc = Formula.addToPipe(f3, "r", "range(9, 10)", Some("__seq"))
    assert(sc.select("r").collect().map(_.getLong(0)).toSeq
      .forall(_ == 9L))
    // a 1-row pipe is REPLACED by the range (the reference test's
    // 1-row pipe becomes the 10-row range(0,10) pipe)
    val one = Seq((42.0, 0L)).toDF("v", "__seq")
    val grown = Formula.addToPipe(one, "r", "range(0, 10)", Some("__seq"))
    assert(grown.count() == 10)
    assert(grown.orderBy("__seq").select("r").collect()
      .map(_.getLong(0)).toSeq == (0L until 10L))
    assert(grown.select("v").distinct().head().getDouble(0) == 42.0)
    // mismatched length errors, as does an empty range
    intercept[IllegalArgumentException] {
      Formula.addToPipe(f3, "r", "range(0, 7)", Some("__seq"))
    }
    intercept[IllegalArgumentException] {
      Formula.addToPipe(f3, "r", "range(4, 4)", Some("__seq"))
    }
    // embedded (non-root) range is refused with a pointed message
    val err = intercept[IllegalArgumentException] {
      Formula.addToPipe(f3, "r", "1 + range(0, 3)", Some("__seq"))
    }
    assert(err.getMessage.contains("root"))
  }

  test("index(x, range(n-1, -1)) reverses the column closed-form") {
    val f = SeaFrame.withSequence(
      Seq("a", "b", "c", "d").toDF("x"), Seq(col("x").asc))
    val out = Formula.addToPipe(f.df, "rev", "index(x, range(3, -1))",
      f.seqCol)
    assert(out.orderBy(SeaFrame.SEQ).select("rev").collect()
      .map(_.getString(0)).toSeq == Seq("d", "c", "b", "a"))
  }

  test("one2Many replicates a scalar pipe (parser.go:1661-1691)") {
    val one = SeaFrame(Seq((0.0275, 180)).toDF("rate", "term"))
    val many = Gather.one2Many(one, 5)
    assert(many.df.count() == 5)
    assert(many.seqCol.isDefined)
    // the broadcast scalar combines with order-dependent formulas
    val out = Formula.addToPipe(many.df, "t", "row(rate)",
      many.seqCol)
    assert(out.select(max(col("t"))).head().getDouble(0) == 4.0)
  }

  test("right join fills the left side (JoinType parity, " +
      "gdata.go:1146-1153)") {
    val l = Seq((1, "a")).toDF("k", "lv")
    val r = Seq((1, 1.5), (2, 2.5)).toDF("k", "rv")
    val j = Joins.join(l, r, "k", "right")
    assert(j.count() == 2)
    val unmatched = j.where(col("k") === 2).head()
    assert(unmatched.getString(j.columns.indexOf("lv")) == "")
  }

  test("toLastDayOfMonth / toFirstDayOfMonth formulas " +
      "(parser.go:795-838)") {
    val df = Seq((java.sql.Date.valueOf("2023-02-15"), 0L))
      .toDF("d", "__seq")
    val out = Formula.addToPipe(
      Formula.addToPipe(df, "eom", "toLastDayOfMonth(d)", Some("__seq")),
      "som", "toFirstDayOfMonth(d)", Some("__seq"))
    val r = out.head()
    assert(r.getAs[java.sql.Date]("eom").toString == "2023-02-28")
    assert(r.getAs[java.sql.Date]("som").toString == "2023-02-01")
  }

  test("conversion formulas: toInt/toFloatSP/toString " +
      "(parser.go:1317-1334)") {
    val df = Seq((1.7, 0L)).toDF("x", "__seq")
    val out = Formula.addToPipe(df, "i", "toInt(x)", Some("__seq"))
    assert(out.schema("i").dataType.typeName == "integer")
    val out2 = Formula.addToPipe(df, "s", "toString(x)", Some("__seq"))
    assert(out2.schema("s").dataType.typeName == "string")
  }

  test("fitted MLlib pipeline save/load round-trip " +
      "(nn.go:441-553 analog)") {
    val df = (1 to 100).map { i =>
      (i / 100.0, if (i % 3 == 0) 1.0 else 0.0)
    }.toDF("x1", "y")
    val layers = ModSpec.parse(Seq(
      "Input(x1)", "FC(size:1, activation:sigmoid)", "Target(y)"))
    val model = ModSpec.toPipeline(layers, classification = true).fit(df)
    val path = java.nio.file.Files.createTempDirectory("graftml")
      .resolve("m").toString
    model.write.overwrite().save(path)
    val loaded = org.apache.spark.ml.PipelineModel.load(path)
    val a = model.transform(df).select("prediction").collect()
      .map(_.getDouble(0)).toSeq
    val b = loaded.transform(df).select("prediction").collect()
      .map(_.getDouble(0)).toSeq
    assert(a == b)
  }
}
