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

  test("range(a,b) is exclusive and direction-aware " +
      "(parser.go:682-723)") {
    val up = Gather.rangePipe(spark, 2, 6).result
      .orderBy("value").collect().map(_.getLong(0)).toSeq
    assert(up == Seq(2L, 3L, 4L, 5L))
    val down = Gather.rangePipe(spark, 6, 2)
    assert(down.df.count() == 4)
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
