package graft

import graft.io.Sources
import graft.ml.ModSpec
import graft.types._
import org.apache.spark.sql.functions._

/** ModSpec DSL -> MLlib pipeline (modspec.go/nn.go surface) and
  * source/sink round-trips.
  */
class MlAndIoSpec extends SparkSuite {
  import spark.implicits._

  test("ModSpec parses the reference layer grammar " +
      "(nn_test.go:136-141)") {
    val layers = ModSpec.parse(Seq(
      "Input(x1 + x2 + x4oh)",
      "FC(size:8, activation:relu)",
      "DropOut(0.1)",
      "FC(size:1, activation:sigmoid)",
      "Target(y)"))
    assert(layers.collectFirst { case i: ModSpec.Input => i }.get
      .features.map(_.name) == Seq("x1", "x2", "x4"))
    assert(layers.collect { case f: ModSpec.FC => f.size } == Seq(8, 1))
    assert(layers.collectFirst { case t: ModSpec.Target => t.field }
      .contains("y"))
  }

  test("ModSpec embedding syntax E(field, k) records width") {
    val layers = ModSpec.parse(Seq("Input(E(x4oh, 3))", "Target(y)"))
    val f = layers.collectFirst { case i: ModSpec.Input => i }.get
      .features.head
    assert(f.oneHot && f.embed == 3)
  }

  test("logistic pipeline fits and predicts sanely (PredictNN analog)") {
    val df = (1 to 200).map { i =>
      val x = i / 200.0
      (x, if (x > 0.5) "hi" else "lo",
        if (x + (i % 7) * 0.01 > 0.55) 1.0 else 0.0)
    }.toDF("x1", "seg", "y")
    val layers = ModSpec.parse(Seq(
      "Input(x1 + segoh)", "FC(size:1, activation:sigmoid)", "Target(y)"))
    val model = ModSpec.toPipeline(layers, classification = true).fit(df)
    val pred = model.transform(df)
    assert(pred.columns.contains("prediction"))
    // a separable-ish problem must beat coin-flip accuracy
    val acc = pred.select(avg(when(col("prediction") === col("y"), 1.0)
      .otherwise(0.0))).head().getDouble(0)
    assert(acc > 0.8, s"accuracy $acc")
  }

  test("multi-FC spec builds an MLP with the real input width " +
      "(nn_test.go:136-141 canonical grammar)") {
    val df = (1 to 200).map { i =>
      val x1 = i / 200.0; val x2 = (i % 10) / 10.0
      (x1, x2, if (i % 4 == 0) "a" else if (i % 4 == 1) "b" else "c",
        if (x1 + 0.2 * x2 > 0.6) 1.0 else 0.0)
    }.toDF("x1", "x2", "x4", "y")
    val layers = ModSpec.parse(Seq(
      "Input(x1 + x2 + x4oh)",
      "FC(size:8, activation:relu)",
      "DropOut(0.1)",
      "FC(size:1, activation:sigmoid)",
      "Target(y)"))
    // x1, x2 continuous + 3 levels one-hot + handleInvalid-keep slot
    val width = ModSpec.assembledWidth(layers, df)
    assert(width == 6, s"width $width")
    val pipeline = ModSpec.pipelineFor(layers, df, classification = true)
    pipeline.getStages.last match {
      case m: org.apache.spark.ml.classification
          .MultilayerPerceptronClassifier =>
        assert(m.getLayers.toSeq == Seq(width, 8, 2))
        m.setMaxIter(30)
      case other => fail(s"expected MLP, got $other")
    }
    val model = pipeline.fit(df)
    val pred = model.transform(df)
    assert(pred.columns.contains("prediction"))
    val acc = pred.select(avg(when(col("prediction") === col("y"), 1.0)
      .otherwise(0.0))).head().getDouble(0)
    assert(acc > 0.6, s"accuracy $acc")
  }

  test("E(f, k) trains a real k-dim embedding lookup, not one-hot " +
      "(modspec.go:306-414)") {
    val rnd = new scala.util.Random(7)
    val df = (1 to 400).map { i =>
      // level decides the target with noise: the trained embedding must
      // separate "hi" from "lo"/"mid" along some dimension
      val lvl = Seq("hi", "mid", "lo")(i % 3)
      val base = lvl match { case "hi" => 0.9; case "mid" => 0.5; case _ => 0.1 }
      val y = if (rnd.nextDouble() < base) 1.0 else 0.0
      (lvl, i / 400.0, y)
    }.toDF("seg", "x1", "y")
    val layers = ModSpec.parse(Seq(
      "Input(x1 + E(segoh, 3))", "FC(size:1, activation:sigmoid)",
      "Target(y)"))
    val fitted = ModSpec.fitEmbedded(layers, df, classification = true)
    // the lookup table is 3 levels x 3 dims of trained floats
    val emb = fitted.embeddings.head
    assert(emb.dim == 3 && emb.table.keySet == Set("hi", "mid", "lo"))
    assert(emb.table.values.forall(_.length == 3))
    // trained, not one-hot: dense values, and the predictive levels
    // land apart in embedding space
    def dist(a: Array[Double], b: Array[Double]) =
      math.sqrt(a.zip(b).map { case (p, q) => (p - q) * (p - q) }.sum)
    assert(dist(emb.table("hi"), emb.table("lo")) > 1e-3)
    assert(emb.table.values.flatten.count(v => v != 0.0 && v != 1.0) > 3)
    // end-to-end transform carries the embedding columns + prediction
    val pred = fitted.transform(df)
    assert(pred.columns.contains("seg__e0") &&
      pred.columns.contains("prediction"))
    val acc = pred.select(avg(when(col("prediction") === col("y"), 1.0)
      .otherwise(0.0))).head().getDouble(0)
    assert(acc > 0.6, s"accuracy $acc")
    // unseen level falls back to the default vector, not a crash
    val unseen = Seq(("zz", 0.5, 0.0)).toDF("seg", "x1", "y")
    assert(fitted.transform(unseen).count() == 1)
  }

  test("embedding lookup: unbounded cardinality errors cleanly; a " +
      "mid-size dictionary compiles to a map lookup, not a when-chain") {
    import graft.ml.Embeddings
    // high-cardinality guard trips before anything materializes
    val wide = (1 to 3000).map(i => (s"lvl$i", i % 2))
      .toDF("seg", "label")
    val ex = intercept[IllegalArgumentException] {
      Embeddings.fit(wide, "seg", "label", k = 2, maxIter = 1,
        maxLevels = 1000)
    }
    assert(ex.getMessage.contains("distinct values"))
    // >32 levels: literal-map path, no CaseWhen in the plan
    val model = Embeddings.EmbeddingModel("seg", 2,
      (1 to 50).map(i => s"lvl$i" -> Array(i * 0.1, -i * 0.1)).toMap,
      Array(0.0, 0.0))
    val out = model(wide.select("seg"))
    val plan = out.queryExecution.analyzed.toString
    // the map path wraps each dim in ONE null-guard CASE; a when-chain
    // would emit one branch per level (50 THENs per dim)
    val branches = "THEN".r.findAllIn(plan).length
    assert(branches <= 2 * model.dim,
      s"50-level lookup compiled to a when-chain ($branches branches)")
    assert(plan.contains("element_at"), "map lookup path not used")
    val got = out.where(col("seg") === "lvl7").head()
    assert(math.abs(got.getAs[Double]("seg__e0") - 0.7) < 1e-12)
    assert(math.abs(got.getAs[Double]("seg__e1") + 0.7) < 1e-12)
    // unseen level takes the default under the map path too
    val miss = model(Seq(("nope", 0)).toDF("seg", "x")).head()
    assert(miss.getAs[Double]("seg__e0") == 0.0)
  }

  test("toPipeline without inputWidth rejects a multi-FC " +
      "classification spec with a clear error") {
    val layers = ModSpec.parse(Seq(
      "Input(x1)", "FC(size:4)", "FC(size:1, activation:sigmoid)",
      "Target(y)"))
    val e = intercept[IllegalArgumentException] {
      ModSpec.toPipeline(layers, classification = true)
    }
    assert(e.getMessage.contains("assembledWidth"))
  }

  test("regression pipeline for a linear target") {
    val df = (1 to 100).map(i => (i.toDouble, 2.0 * i + 1.0))
      .toDF("x1", "y")
    val layers = ModSpec.parse(Seq(
      "Input(x1)", "FC(size:1)", "Target(y)"))
    val model = ModSpec.toPipeline(layers, classification = false).fit(df)
    val mse = model.transform(df)
      .select(avg(pow(col("prediction") - col("y"), 2.0)))
      .head().getDouble(0)
    assert(mse < 1e-6, s"mse $mse")
  }

  test("marginal effects: per-segment response curve over a feature " +
      "sweep (diags.go:534-731)") {
    val df = (1 to 300).map { i =>
      val x = i / 300.0; val z = (i % 10) / 10.0
      (x, z, if (x + 0.1 * z > 0.55) 1.0 else 0.0)
    }.toDF("x1", "x2", "y")
    val layers = ModSpec.parse(Seq(
      "Input(x1 + x2)", "FC(size:1, activation:sigmoid)", "Target(y)"))
    val model = ModSpec.toPipeline(layers, classification = true).fit(df)
    val m = graft.ml.Diagnostics.marginal(model, df, Seq("x1", "x2"),
      "x1", nSeg = 4, sweepPoints = 5)
    val rows = m.collect()
    assert(rows.length >= 4 * 2) // segments x >=2 distinct sweep values
    // within each segment, prediction must be monotone nondecreasing
    // in x1 for this separable data
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val preds = rs.sortBy(_.getDouble(1)).map(_.getDouble(2))
      assert(preds.zip(preds.tail).forall { case (a, b) => b >= a - 1e-9 })
    }
  }

  test("marginal sketch path: GK rank-contract audit passes for a " +
      "provisioned sketch, raises for an under-provisioned one") {
    // two features: the NON-sweep feature's (audited) median feeds
    // the prediction grid — a single-feature call would overwrite the
    // only median with the sweep value and never evaluate the gate
    val df = (1 to 20000)
      .map(i => (i.toDouble, ((i * 7919) % 20000).toDouble))
      .toDF("x", "z")
    val m = new graft.ml.Diagnostics.LinearModel(
      Seq("x" -> 1.0, "z" -> 1.0), 0.0)
    // default accuracy 10000: rank error <= n/10000 = 2 — well inside
    // the 0.001 * n = 10-rank tolerance band; audit passes
    val ok = graft.ml.Diagnostics.marginal(m, df, Seq("x", "z"), "x",
      nSeg = 2, sweepPoints = 3, auditRankTol = 0.001)
    assert(ok.count() >= 2)
    // accuracy 1 keeps O(1) samples — its rank error on 10k-row
    // segments cannot stay within the +-10-rank band, so the in-plan
    // gate raises instead of serving a broken curve
    val under = graft.ml.Diagnostics.marginal(m, df, Seq("x", "z"), "x",
      nSeg = 2, sweepPoints = 3, auditRankTol = 0.001,
      medianAccuracy = 1)
    val ex = intercept[Throwable] { under.collect() }
    def mentions(t: Throwable): Boolean = t != null &&
      (String.valueOf(t.getMessage).contains("GK broke") ||
        mentions(t.getCause))
    assert(mentions(ex), s"unexpected failure: $ex")
    graft.Caches.release()
  }

  test("csv sink -> source round trip with role inference " +
      "(CSVToPipe, ch.go:165-171)") {
    val tmp = java.nio.file.Files.createTempDirectory("graftio").toString
    val f = Sources.parquetToPipe(spark,
      s"${TestSpark.sfDir}/nation.parquet")
    Sources.pipeToCsv(f, s"$tmp/nation_csv")
    val back = Sources.csvToPipe(spark, s"$tmp/nation_csv")
    assert(back.df.count() == f.df.count())
    // string -> Cat, int -> Cts per the reference's role rule
    assert(back.schema("n_name").role == FeatureRole.Cat)
    assert(back.schema("n_nationkey").role == FeatureRole.Cts)
  }

  test("xml sink -> source round trip (Spark 4 native xml format): " +
      "values survive, reads re-infer types like csv/json") {
    val tmp = java.nio.file.Files.createTempDirectory("graftxml").toString
    val f = Sources.parquetToPipe(spark,
      s"${TestSpark.sfDir}/region.parquet")
    Sources.pipeToXml(f, s"$tmp/region_xml")
    val back = Sources.xmlToPipe(spark, s"$tmp/region_xml")
    assert(back.df.count() == f.df.count())
    val names = back.df
      .select(org.apache.spark.sql.functions.col("r_name")
        .cast("string"))
      .collect().map(_.getString(0)).toSet
    val orig = f.df.select("r_name").collect()
      .map(_.getString(0)).toSet
    assert(names == orig, s"$names vs $orig")
  }

  test("csv inference-tolerance divergence: dirty numeric column " +
      "infers Cat (vs reference Impute 0.98 -> Cts); explicit Cts " +
      "override parses with nulls (pipeline.go:326,340)") {
    val tmp = java.nio.file.Files.createTempDirectory("graftdirty")
    // 97%-numeric column: the reference's 0.98-tolerance sampler
    // would STILL call this categorical, but at 0.98-exactly-met
    // ratios it calls it numeric; Spark's exact inferSchema flips on
    // the single bad cell either way
    val rows = "id,x" +: (0 until 97).map(i => s"$i,$i.5") :+ "97,oops"
    java.nio.file.Files.writeString(tmp.resolve("d.csv"),
      rows.mkString("\n"))
    val inferred = Sources.csvToPipe(spark, tmp.toString)
    assert(inferred.schema("x").role == FeatureRole.Cat)
    assert(inferred.df.schema("x").dataType.typeName == "string")
    // the documented escape hatch: an explicit Cts override parses
    // the column, imputing the unparseable cell to null
    val over = graft.types.FeatureSchema(Seq(
      graft.types.FeatureMeta("x", FeatureRole.Cts)))
    val forced = Sources.csvToPipe(spark, tmp.toString, over)
    assert(forced.df.schema("x").dataType.typeName == "double")
    assert(forced.df.where(col("x").isNull).count() == 1)
    assert(forced.df.where(col("x").isNotNull).count() == 97)
    assert(forced.schema("x").role == FeatureRole.Cts)
  }

  test("vecToPipe builds a pipeline from column vectors " +
      "(VecFromAny, vec.go:38-70)") {
    val f = Sources.vecToPipe(spark, Seq(
      "name" -> Seq("a", "b", "c"),
      "value" -> Seq(1.5, 2.5, 3.5),
      "n" -> Seq(10L, 20L, 30L)), orderBy = Seq("name"))
    assert(f.df.count() == 3)
    assert(f.df.schema("value").dataType.typeName == "double")
    assert(f.row(1).result.select("name").head().getString(0) == "b")
    // ragged columns rejected
    intercept[IllegalArgumentException] {
      Sources.vecToPipe(spark, Seq("a" -> Seq(1.0), "b" -> Seq(1.0, 2.0)))
    }
  }

  test("readRows streams rows in sequence order " +
      "(GData reader, gdata.go:653-722)") {
    val f = Sources.vecToPipe(spark, Seq(
      "k" -> Seq("c", "a", "b")), orderBy = Seq("k"))
    val got = f.readRows().map(_.getString(0)).toSeq
    assert(got == Seq("a", "b", "c"))
  }

  test("describe approx mode matches exact on small data") {
    import graft.functions.Stats
    val df = (1 to 100).map(_.toDouble).toDF("x")
    val exact = Stats.describe(df, "x").head()
    val approx = Stats.describe(df, "x", approx = true).head()
    assert(exact.getAs[Long]("n") == approx.getAs[Long]("n"))
    assert(math.abs(exact.getAs[Double]("q50") -
      approx.getAs[Double]("q50")) < 2.0)
  }

  test("sqlToPipe runs SQL over registered views " +
      "(SQLToPipe, pipeline.go:296-321)") {
    QH.read(spark, TestSpark.sfDir, "region")
      .createOrReplaceTempView("region_v")
    val f = Sources.sqlToPipe(spark,
      "SELECT r_name FROM region_v WHERE r_regionkey < 2")
    assert(f.df.count() == 2)
  }

  test("in-plan quality gate: good predictions pass, a degenerated " +
      "solver's output raises on materialization") {
    import spark.implicits._
    val good = Seq((1.0, 1.0), (0.0, 0.0), (1.0, 1.0), (0.0, 0.0))
      .toDF("label", "prediction")
    val ok = QueriesML.gatedPreds(good, "label", "prediction", 0.9, "t")
      .select("prediction").collect().map(_.getDouble(0)).toSeq
    assert(ok == Seq(1.0, 0.0, 1.0, 0.0))
    val bad = Seq((1.0, 0.0), (0.0, 1.0), (1.0, 0.0), (0.0, 0.0))
      .toDF("label", "prediction")
    val e = intercept[Exception] {
      QueriesML.gatedPreds(bad, "label", "prediction", 0.9, "t")
        .select("prediction").collect()
    }
    assert(e.getMessage.contains("quality gate") ||
      (e.getCause != null && e.getCause.getMessage.contains("quality gate")))
  }
}
