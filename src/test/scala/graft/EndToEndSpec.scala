package graft

import graft.encode.Encode
import graft.exprlang.Formula
import graft.io.Sources
import graft.ops.Joins
import graft.types.{FeatureMeta, FeatureRole, FeatureSchema}
import org.apache.spark.sql.functions._

/** SURVEY §7.2 minimum end-to-end slice, shaped after the reference's
  * ExampleJoin + expression pipeline (pipeline_test.go:61-106,
  * parser_test.go:905): CSV read -> role inference with an override ->
  * label encode -> inner join on the shared key -> formula column ->
  * aggregate, asserted against hand-computed values.
  */
class EndToEndSpec extends SparkSuite {

  private def writeCsv(name: String, content: String): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_e2e")
    val f = dir.resolve(name)
    java.nio.file.Files.writeString(f, content)
    f.toString
  }

  test("CSV -> roles -> encode -> join -> formula -> aggregate") {
    // pipeTest1-shaped: string cat, int key (forced cat), double cts
    val p1 = writeCsv("pipeTest1.csv",
      """Field1,row,Field3
        |a,1,1.0
        |b,2,2.0
        |c,3,3.0
        |d,4,4.0
        |e,5,5.0
        |f,6,6.0
        |g,7,7.0
        |""".stripMargin)
    // pipeTest2-shaped: partial key overlap, extra numerics, a date
    val p2 = writeCsv("pipeTest2.csv",
      """row,newField1,newField2,newField3,date
        |0,x,10.0,0.5,3/1/2023
        |2,y,20.0,1.5,3/2/2023
        |3,z,30.0,2.5,3/3/2023
        |4,w,40.0,3.5,3/4/2023
        |""".stripMargin)

    // read with inference; force the int key to categorical like the
    // reference's WithCats override (pipeline_test.go:17-28)
    val left = Sources.csvToPipe(spark, p1,
      overrides = FeatureSchema(Seq(FeatureMeta("row", FeatureRole.Cat))))
    val right = Sources.csvToPipe(spark, p2)
    assert(left.schema("Field1").role == FeatureRole.Cat)
    assert(left.schema("Field3").role == FeatureRole.Cts)
    assert(left.schema("row").role == FeatureRole.Cat)

    // label-encode the string column (sorted-value codes)
    val encoded = left.appendD("Field1", "Field1_code")
    assert(encoded.schema("Field1_code").levels ==
      Map("a" -> 0, "b" -> 1, "c" -> 2, "d" -> 3, "e" -> 4, "f" -> 5,
        "g" -> 6))

    // inner join on the shared-name key: rows 2,3,4 match
    val joined = Joins.seaJoin(encoded, right, "row", "inner")
    assert(joined.df.count() == 3)

    // formula over joined numerics: Field3 + 3 * newField3
    val withZ = Formula.addToPipe(joined.df, "z",
      "Field3 + 3 * newField3", joined.seqCol)
    val zs = withZ.orderBy("row").select("z").collect()
      .map(_.getDouble(0)).toSeq
    // rows 2,3,4: 2+3*1.5=6.5, 3+3*2.5=10.5, 4+3*3.5=14.5
    assert(zs == Seq(6.5, 10.5, 14.5))

    // summary aggregate through the formula path: mean(z) = 10.5
    val meanZ = Formula.column(withZ, "mean(z)")
    assert(withZ.select(meanZ).head().getDouble(0) == 10.5)

    // the M/D/CCYY date string parses through the formula's toDate
    // (reference date format, parser.go:71)
    val dates = withZ
      .select(Formula.column(withZ, "toDate(date)").cast("string"))
      .orderBy("row").collect().map(_.getString(0)).toSeq
    assert(dates == Seq("2023-03-02", "2023-03-03", "2023-03-04"))
  }

  test("training-data pipeline end-to-end: quality filter -> dedup " +
      "clusters -> decontaminate -> split -> pack") {
    import graft.llmdata.{Dedup, Packing, Sampling, TextAnalysis}
    import spark.implicits._
    val docs = spark.read
      .parquet(s"${TestSpark.sfDir}/documents.parquet")
      .select("doc_id", "text")
    val total = docs.count()

    // 1. quality gate: drop junk documents
    val quality = TextAnalysis.qualityScore(docs, "text")
      .where(col("quality") >= 0.3).select("doc_id", "text")
    val nQuality = quality.count()
    assert(nQuality > 0 && nQuality <= total)

    // 2. dedup: exact groups + near-dup clusters -> keep canonical docs
    val pairs = Dedup.minhashDedup(quality, "doc_id", "text",
      threshold = 0.7)
    val clusters = Dedup.duplicateClusters(pairs)
    val dropDups = clusters.where(col("doc_id") =!= col("canonical_id"))
      .select(col("doc_id"))
    val deduped = quality.join(dropDups, Seq("doc_id"), "left_anti")
    val nDeduped = deduped.count()
    assert(nDeduped <= nQuality && nDeduped > 0)

    // 3. decontaminate against a held-out "eval set" (last 50 ids)
    val evalSet = docs.where(col("doc_id") >= total - 50)
    val contaminated = Dedup.crossContamination(deduped, evalSet,
        "doc_id", "text", threshold = 0.8, measure = "containment")
      .select(col("train_id").as("doc_id")).distinct()
    val clean = deduped.join(contaminated, Seq("doc_id"), "left_anti")

    // 4. reproducible split, 5. pack the train split
    val split = Sampling.assignSplit(clean, "doc_id",
      Seq("train" -> 0.9, "valid" -> 0.1))
    val train = split.where(col("split") === "train")
    val packed = Packing.packBySequence(train, "doc_id",
      TextAnalysis.tokenCountWs(col("text")), capacity = 2000)
    val stats = Packing.packStats(packed, capacity = 2000).collect()

    // coherence: counts only ever shrink, every train doc is packed,
    // pack totals reconcile with the sum of token counts
    val nTrain = train.count()
    assert(packed.count() == nTrain)
    assert(stats.map(_.getAs[Long]("n_docs")).sum == nTrain)
    val tokTotal = packed.agg(sum(col("n_tokens"))).head().getLong(0)
    assert(stats.map(_.getAs[Long]("pack_tokens")).sum == tokTotal)
    // the pipeline is deterministic end-to-end: re-running yields the
    // same membership
    val again = Sampling.assignSplit(clean, "doc_id",
      Seq("train" -> 0.9, "valid" -> 0.1))
      .where(col("split") === "train").count()
    assert(again == nTrain)
  }

  test("fitted schema persists and re-encodes a NEW dataset " +
      "(FTypes save/load -> UpdateFts, fields.go + gdata.go:555)") {
    import spark.implicits._
    val train = Seq(("a", 10.0), ("b", 20.0), ("c", 30.0)).toDF("k", "v")
    val (_, kMeta) = Encode.appendD(train, "k", "k")
    val (_, vMeta) = Encode.appendC(train, "v", "v", normalize = true)
    val path = java.nio.file.Files.createTempDirectory("graft_schema")
      .resolve("fts.json").toString
    FeatureSchema(Seq(kMeta.copy(default = Some("a")), vMeta)).save(path)

    val loaded = FeatureSchema.load(path)
    // apply to new data containing an unseen level
    val apply = Seq(("b", 20.0), ("zzz", 40.0)).toDF("k", "v")
    val (out, _) = Encode.reInit(apply, loaded)
    val rows = out.orderBy("v").collect()
    assert(rows(0).getInt(rows(0).fieldIndex("k")) == 1) // b -> 1
    assert(rows(1).getInt(rows(1).fieldIndex("k")) == 0) // unseen -> default a
    // v re-encoded under the TRAINING mean/std (20, 10): (40-20)/10 = 2
    assert(math.abs(rows(1).getDouble(rows(1).fieldIndex("v")) - 2.0) < 1e-9)
  }

  test("SparkEntry.entry (the driver's smoke check) returns segment " +
      "rows with the expected shape") {
    val df = SparkEntry.entry(spark)
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(df.columns.toSeq ==
      Seq("c_mktsegment", "n_orders", "n_high_value", "avg_price"))
    rows.foreach { r =>
      assert(r.getLong(1) >= r.getLong(2)) // high-value ⊆ all orders
    }
  }

  test("driver contract integrity: no duplicate query keys across " +
      "catalog files, every oracle key names a query") {
    val parts = Seq(QueriesRelational.all, QueriesAgg.all,
      QueriesExpr.all, QueriesML.all, QueriesLLM.all, QueriesStream.all,
      QueriesStats.all)
    val merged = Queries.all
    // a duplicate key across files would be silently overwritten by ++
    assert(parts.map(_.size).sum + 1 == merged.size, // +1 = q14 in Queries
      s"duplicate query keys: ${parts.flatMap(_.keys)
        .groupBy(identity).collect { case (k, vs) if vs.size > 1 => k }}")
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle entries without queries: $orphans")
  }
}
