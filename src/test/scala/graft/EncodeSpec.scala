package graft

import graft.encode.Encode
import graft.types._
import org.apache.spark.sql.functions._

/** Encoding semantics from the reference: sorted-value level codes,
  * fit/apply asymmetry, unseen-value defaults, one-hot width,
  * inverse transforms (gdata.go:80-272, 518-552; data.go:703-715).
  */
class EncodeSpec extends SparkSuite {
  import spark.implicits._

  test("appendD codes levels by sorted value (data.go:703-715)") {
    val df = Seq("b", "c", "a", "b").toDF("x")
    val (enc, meta) = Encode.appendD(df, "x", "xe")
    assert(meta.levels == Map("a" -> 0, "b" -> 1, "c" -> 2))
    val got = enc.orderBy("x").select("xe").collect().map(_.getInt(0)).toSeq
    assert(got == Seq(0, 1, 1, 2))
  }

  test("appendD applies a fitted dictionary; unseen -> default " +
      "(gdata.go:185-197)") {
    val train = Seq("a", "b").toDF("x")
    val fitted = Encode.fitD(train, "x", default = Some("a"))
    val apply = Seq("a", "z").toDF("x")
    val (enc, _) = Encode.appendD(apply, "x", "xe", Some(fitted))
    val got = enc.orderBy("x").select("xe").collect().map(_.getInt(0)).toSeq
    assert(got == Seq(0, 0)) // z -> default a -> code 0
  }

  test("appendD unseen without default errors (gdata.go:196)") {
    val fitted = Encode.fitD(Seq("a", "b").toDF("x"), "x")
    val (enc, _) = Encode.appendD(Seq("z").toDF("x"), "x", "xe", Some(fitted))
    intercept[Exception] { enc.collect() }
  }

  test("appendD rejects float columns (gdata.go:171)") {
    intercept[IllegalArgumentException] {
      Encode.fitD(Seq(1.5, 2.5).toDF("x"), "x")
    }
  }

  test("fitD caps dictionary cardinality before collecting to the " +
      "driver") {
    val wide = (1 to 200).map(i => s"v$i").toDF("x")
    val e = intercept[IllegalArgumentException] {
      Encode.fitD(wide, "x", maxLevels = 50)
    }
    assert(e.getMessage.contains("distinct values"))
    // under the cap fits fine
    assert(Encode.fitD(wide, "x", maxLevels = 500).levels.size == 200)
  }

  test("appendC z-score fit + exact inverse (gdata.go:80-153, 518-552)") {
    val df = Seq(1.0, 2.0, 3.0, 4.0).toDF("x")
    val (enc, meta) = Encode.appendC(df, "x", "xz", normalize = true)
    assert(math.abs(meta.location - 2.5) < 1e-12)
    val z = enc.orderBy("x").select("xz").collect().map(_.getDouble(0))
    assert(math.abs(z.sum) < 1e-12) // mean-centered
    val back = enc.select(Encode.unNormalize(col("xz"), meta).as("b"))
      .orderBy("b").collect().map(_.getDouble(0)).toSeq
    back.zip(Seq(1.0, 2.0, 3.0, 4.0)).foreach { case (g, e) =>
      assert(math.abs(g - e) < 1e-9)
    }
  }

  test("appendC refuses degenerate scale (gdata.go:134-136)") {
    intercept[IllegalArgumentException] {
      Encode.appendC(Seq(5.0, 5.0, 5.0).toDF("x"), "x", "xz",
        normalize = true)
    }
  }

  test("appendC applies fitted params to NEW data (train/apply split)") {
    val train = Seq(0.0, 10.0).toDF("x") // mean 5, sd ~7.07
    val (_, meta) = Encode.appendC(train, "x", "xz", normalize = true)
    val (enc, _) = Encode.appendC(Seq(5.0).toDF("x"), "x", "xz",
      normalize = true, fitted = Some(meta))
    assert(math.abs(enc.head().getDouble(1)) < 1e-12) // (5-5)/sd = 0
  }

  test("makeOneHot emits full-width dense 0/1 columns " +
      "(gdata.go:246-251)") {
    val df = Seq("a", "b", "c").toDF("x")
    val (enc, meta) = Encode.appendD(df, "x", "xe")
    val (oh, _) = Encode.makeOneHot(enc, meta, "xe", "x_oh")
    assert(oh.columns.count(_.startsWith("x_oh_")) == 3)
    val rows = oh.orderBy("x").select("x_oh_0", "x_oh_1", "x_oh_2")
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2)))
    assert(rows.toSeq == Seq((1.0, 0.0, 0.0), (0.0, 1.0, 0.0),
      (0.0, 0.0, 1.0)))
  }

  test("large dictionaries (>32 levels) take the map-lookup path: " +
      "round-trip + default + error semantics hold") {
    val values = (0 until 100).map(i => f"lvl$i%03d")
    val df = values.toDF("x")
    val (enc, meta) = Encode.appendD(df, "x", "xe")
    assert(meta.levels.size == 100)
    // sorted-value codes
    assert(meta.levels("lvl000") == 0 && meta.levels("lvl099") == 99)
    // round trip through the map path
    val bad = enc.select(col("x"),
      Encode.decodeD(col("xe"), meta).as("back"))
      .where(col("x") =!= col("back"))
    assert(bad.count() == 0)
    // unseen with default
    val fitted = meta.copy(default = Some("lvl007"))
    val (enc2, _) = Encode.appendD(Seq("zzz").toDF("x"), "x", "xe",
      Some(fitted))
    assert(enc2.head().getInt(1) == 7)
    // unseen without default errors
    val (enc3, _) = Encode.appendD(Seq("zzz").toDF("x"), "x", "xe",
      Some(meta))
    intercept[Exception] { enc3.collect() }
  }

  test("decodeD inverts the level map (GetRaw, gdata.go:518-552)") {
    val df = Seq("a", "b").toDF("x")
    val (enc, meta) = Encode.appendD(df, "x", "xe")
    val back = enc.select(Encode.decodeD(col("xe"), meta).as("raw"))
      .orderBy("raw").collect().map(_.getString(0)).toSeq
    assert(back == Seq("a", "b"))
  }

  test("reInit re-encodes a table under a schema (gdata.go:1078-1120)") {
    val df = Seq(("a", 1.0), ("b", 2.0)).toDF("cat", "cts")
    val schema = FeatureSchema(Seq(
      FeatureMeta("cat", FeatureRole.Cat),
      FeatureMeta("cts", FeatureRole.Cts, normalized = true)))
    val (out, newSchema) = Encode.reInit(df, schema)
    assert(newSchema("cat").levels.size == 2)
    assert(newSchema("cts").normalized)
    assert(out.count() == 2)
  }

  test("FeatureSchema JSON round-trip (fields.go:132-286)") {
    val s = FeatureSchema(Seq(
      FeatureMeta("a", FeatureRole.Cat, levels = Map("x" -> 0, "y" -> 1),
        default = Some("x")),
      FeatureMeta("b", FeatureRole.Cts, location = 1.5, scale = 2.5,
        normalized = true),
      FeatureMeta("c", FeatureRole.OneHot, from = Some("a"))))
    val rt = FeatureSchema.read(s.toJson)
    assert(rt == s)
  }

  test("robust scaling: exact median/IQR fit, outlier-immune where " +
      "the z-score fit is not; refit vs fitted parity") {
    import spark.implicits._
    // 1..9 plus a huge outlier: median 5.5, q25 3, q75 8 (exact
    // data points), IQR 5 — the outlier shifts NONE of them
    val vals = ((1 to 9).map(_.toDouble) :+ 1e9).toDF("x")
    val (scaled, meta) = Encode.appendRobust(vals, "x", "xr")
    assert(meta.scale == 5.0, s"IQR ${meta.scale}")
    assert(meta.location == 5.0 || meta.location == 6.0) // disc median
    val got = scaled.orderBy("x").collect().map(_.getDouble(1))
    assert(got(0) == (1.0 - meta.location) / 5.0)
    // applying the SAME fit to new data reuses the constants
    val (applied, m2) = Encode.appendRobust(
      Seq(100.0).toDF("x"), "x", "xr", fitted = Some(meta))
    assert(m2 == meta.copy(name = "xr"))
    assert(applied.head().getDouble(1) ==
      (100.0 - meta.location) / 5.0)
    // degenerate IQR refused
    val flat = Seq.fill(10)(3.0).toDF("x")
    val ex = intercept[IllegalArgumentException](
      Encode.fitRobust(flat, "x"))
    assert(ex.getMessage.contains("IQR"))
  }
}
