package graft.io

import graft.types._
import graft.frame.SeaFrame
import graft.encode.Encode
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** Sources and sinks (reference SURVEY §2.1): CSV with type inference
  * and role resolution, parquet, JDBC. The reference's eager
  * Init()-materializes-everything becomes a lazy planned scan —
  * Catalyst pushes filters/projections into the reader.
  */
object Sources {

  /** CSVToPipe (pipeline.go:325-364): header + inferSchema, then role
    * resolution by the reference's rule — date/string columns are
    * categorical, numeric are continuous (ch.go:165-171) — with
    * user FType overrides.
    *
    * INFERENCE-TOLERANCE DIVERGENCE (documented, deliberate): the
    * reference types a column by SAMPLING with a 0.98 tolerance
    * (`Impute(rdr, 0, .98)`, pipeline.go:326,340) — a column that is
    * 98% numeric is declared numeric and the stragglers impute to
    * null. Spark's `inferSchema` is exact over ALL rows: one
    * non-numeric cell makes the whole column a string. On clean data
    * the two agree; on dirty CSVs (a 97%-numeric column) the
    * reference yields FRCts-with-nulls where we yield FRCat. The
    * Spark behavior is kept on purpose — silent value-dropping at
    * 100 TB is a data-loss bug, not a convenience; callers who want
    * the reference semantics pass an explicit FType override (the
    * column parses via cast, unparseable cells become null), which is
    * also the only deterministic contract under distributed sampling.
    * Pinned by the dirty-column spec in MlAndIoSpec.
    */
  def csvToPipe(spark: SparkSession, path: String,
      overrides: FeatureSchema = FeatureSchema.empty,
      orderBy: Seq[String] = Nil): SeaFrame = {
    val df = spark.read
      .option("header", true).option("inferSchema", true)
      .csv(path)
    wrap(df, overrides, orderBy)
  }

  /** Parquet scan (the harness's native format). */
  def parquetToPipe(spark: SparkSession, path: String,
      overrides: FeatureSchema = FeatureSchema.empty,
      orderBy: Seq[String] = Nil): SeaFrame =
    wrap(spark.read.parquet(path), overrides, orderBy)

  /** SQLToPipe (pipeline.go:296-321): arbitrary SQL against
    * registered temp views (the in-engine analog of pushing SQL to
    * ClickHouse) or a JDBC source when a url is given.
    */
  def sqlToPipe(spark: SparkSession, sql: String,
      jdbcUrl: Option[String] = None): SeaFrame = jdbcUrl match {
    case None => wrap(spark.sql(sql), FeatureSchema.empty, Nil)
    case Some(url) => wrap(
      spark.read.format("jdbc").option("url", url).option("query", sql)
        .load(), FeatureSchema.empty, Nil)
  }

  /** VecFromAny (vec.go:38-70): build a pipeline from named column
    * vectors. Element types are inferred per column from the first
    * non-null value (double/long/int/string/boolean/date/timestamp);
    * columns must share a row count.
    */
  def vecToPipe(spark: SparkSession, columns: Seq[(String, Seq[Any])],
      orderBy: Seq[String] = Nil): SeaFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    require(columns.nonEmpty, "vecToPipe: no columns")
    val n = columns.head._2.length
    require(columns.forall(_._2.length == n),
      "vecToPipe: ragged columns (vec.go requires uniform length)")
    def typeOf(v: Any): DataType = v match {
      case _: Double => DoubleType
      case _: Float => FloatType
      case _: Long => LongType
      case _: Int => IntegerType
      case _: String => StringType
      case _: Boolean => BooleanType
      case _: java.sql.Date => DateType
      case _: java.sql.Timestamp => TimestampType
      case other => throw new IllegalArgumentException(
        s"vecToPipe: unsupported element ${other.getClass}")
    }
    val schema = StructType(columns.map { case (name, vs) =>
      StructField(name, typeOf(vs.find(_ != null).getOrElse("")),
        nullable = true)
    })
    val rows = (0 until n).map(i =>
      Row.fromSeq(columns.map(_._2(i))))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq), schema)
    wrap(df, FeatureSchema.empty, orderBy)
  }

  private def wrap(df0: DataFrame, overrides: FeatureSchema,
      orderBy: Seq[String]): SeaFrame = {
    // the deterministic stand-in for the reference's Impute tolerance
    // (see csvToPipe doc): an explicit Cts override on a string-typed
    // column parses it — unparseable cells become null instead of
    // flipping the whole column categorical
    val df = df0.schema.fields.foldLeft(df0) { (d, f) =>
      if (f.dataType.typeName == "string" &&
          overrides.get(f.name).exists(_.role == FeatureRole.Cts))
        // try_cast, not cast: ANSI mode must impute, not throw
        d.withColumn(f.name, col(f.name).try_cast("double"))
      else d
    }
    val metas = df.schema.fields.map { f =>
      overrides.get(f.name).getOrElse {
        val role = f.dataType.typeName match {
          case "string" | "date" | "timestamp" => FeatureRole.Cat
          case _ => FeatureRole.Cts
        }
        FeatureMeta(f.name, role)
      }
    }
    val base = if (orderBy.nonEmpty)
      SeaFrame.withSequence(df, orderBy.map(col(_).asc))
    else SeaFrame(df)
    base.copy(schema = FeatureSchema(metas.toIndexedSeq))
  }

  /** PipeToCSV (pipeline.go:395-425). */
  def pipeToCsv(frame: SeaFrame, path: String): Unit =
    frame.result.write.mode(SaveMode.Overwrite)
      .option("header", true).csv(path)

  /** Parquet sink. */
  def pipeToParquet(frame: SeaFrame, path: String): Unit =
    frame.result.write.mode(SaveMode.Overwrite).parquet(path)

  /** JSON-lines sink/source (the interchange format most curation
    * pipelines ingest): schema re-inferred on read, so the round trip
    * exercises the same inference contract as CSV (q103 family).
    */
  def pipeToJson(frame: SeaFrame, path: String): Unit =
    frame.result.write.mode(SaveMode.Overwrite).json(path)

  def jsonToPipe(spark: org.apache.spark.sql.SparkSession,
      path: String): SeaFrame =
    SeaFrame(spark.read.json(path))

  /** ORC sink/source — the other columnar format Spark ships
    * natively; typed schema travels in the file like parquet.
    */
  def pipeToOrc(frame: SeaFrame, path: String): Unit =
    frame.result.write.mode(SaveMode.Overwrite).orc(path)

  def orcToPipe(spark: org.apache.spark.sql.SparkSession,
      path: String): SeaFrame =
    SeaFrame(spark.read.orc(path))

  /** XML sink/source via Spark 4's NATIVE XML data source (no
    * external spark-xml package — built into spark-sql since 4.0):
    * one element per row under `rowTag`. XML carries no type
    * metadata, so reads infer; round-trip callers re-cast like the
    * CSV/JSON paths.
    */
  def pipeToXml(frame: SeaFrame, path: String,
      rowTag: String = "row"): Unit =
    frame.result.write.mode(SaveMode.Overwrite)
      .option("rowTag", rowTag).format("xml").save(path)

  def xmlToPipe(spark: org.apache.spark.sql.SparkSession,
      path: String, rowTag: String = "row"): SeaFrame =
    SeaFrame(spark.read.option("rowTag", rowTag).format("xml")
      .load(path))

  /** Hive-partitioned sink: one directory per distinct value of the
    * partition columns (`path/lang=en/...`), so an equality or IN
    * predicate on those columns prunes whole directories at PLANNING
    * time — the scan never lists, opens, or stats the excluded
    * files. The coarse complement of row-group min/max pushdown: at
    * 100 TB a `lang = 'en'` query over a lang-partitioned corpus
    * reads the en share of the data and *none* of the rest, and the
    * pruning cost is a metadata lookup, not I/O. Partition columns
    * should be low-cardinality (a directory per value); the row data
    * for those columns lives in the path, not the files.
    */
  def writePartitioned(df: DataFrame, path: String,
      partCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partCols: _*)
      .parquet(path)

  /** Bucketed sink: pre-shuffle once at write time so subsequent
    * equi-joins/aggregations on the bucket key run with NO exchange —
    * the co-located-join strategy for repeatedly-joined fact tables
    * at scale. Requires a table (metastore) sink; bucket count should
    * match across co-joined tables.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      buckets: Int): Unit = {
    val spark = df.sparkSession
    // an earlier SESSION's physical location outlives the in-memory
    // catalog; saveAsTable then refuses the name (LOCATION_ALREADY_
    // EXISTS), so clear both the entry and the stale directory
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val wh = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(wh)) fs.delete(wh, true)
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)
  }

  /** PipeToSQL (pipeline.go:367-392): JDBC table or saveAsTable. */
  def pipeToSql(frame: SeaFrame, table: String,
      jdbcUrl: Option[String] = None): Unit = jdbcUrl match {
    case None => frame.result.write.mode(SaveMode.Overwrite)
      .saveAsTable(table)
    case Some(url) => frame.result.write.format("jdbc")
      .option("url", url).option("dbtable", table)
      .mode(SaveMode.Overwrite).save()
  }
}
