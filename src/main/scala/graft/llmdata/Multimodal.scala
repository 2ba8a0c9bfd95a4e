package graft.llmdata

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: media as opaque BINARY columns plus a
  * typed metadata struct, with decode / feature-extract / resize /
  * frame-sample stages shaped for distribution.
  *
  * The Spark-side contract is real: schema, batch shape, partitioning,
  * and the pipeline topology are what a production image/audio
  * pipeline uses. The codec itself is STUBBED (this environment ships
  * no image/audio libraries): [[StubCodec]] produces deterministic
  * fake decodes keyed by the content hash, so every downstream stage
  * is testable end-to-end.
  */
object Multimodal {

  /** Media metadata struct — the typed companion to the opaque bytes. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("sample_rate", IntegerType)))

  /** Wrap a binary payload column with derived metadata. The stub
    * derives deterministic dimensions from the content hash — a real
    * deployment parses the container header here (a cheap,
    * header-only read, NOT a full decode).
    */
  def withMediaMeta(df: DataFrame, payload: String): DataFrame = {
    val h = abs(xxhash64(col(payload)))
    df.withColumn("media_meta", struct(
      element_at(array(lit("jpeg"), lit("png"), lit("wav"), lit("mp4")),
        (pmod(h, lit(4L)) + 1L).cast("int")).as("format"),
      (pmod(h, lit(1920L)) + 1L).cast("int").as("width"),
      (pmod(h, lit(1080L)) + 1L).cast("int").as("height"),
      (pmod(h, lit(300L)) + 1L).cast("int").as("n_frames"),
      lit(16000).as("sample_rate")))
  }

  /** STUB decode: a deterministic 8-float "feature vector" derived
    * from the payload bytes. A real deployment replaces the body with
    * an image decode + model embed, executed per partition so codec
    * state is reused across rows (mapPartitions shape, no per-row
    * library init).
    */
  def stubDecodeFeatures(payload: Column): Column =
    array((0 until 8).map { i =>
      (pmod(xxhash64(payload, lit(i)), lit(1000L)).cast("double") / 1000.0)
    }: _*)

  /** Frame sampling plan: which frame indices to decode for a video
    * payload — every `stride`-th frame capped at `maxFrames`. Planning
    * is pure metadata arithmetic; only the selected frames would be
    * decoded downstream.
    */
  def sampleFrames(nFrames: Column, stride: Int, maxFrames: Int): Column =
    slice(sequence(lit(0), nFrames - 1, lit(stride)), 1, maxFrames)

  /** The full stub pipeline over a text-derived payload (the harness
    * has no binary fixtures, so payload = utf8 bytes of a text column;
    * byte-level semantics are identical).
    */
  def pipeline(df: DataFrame, textCol: String): DataFrame = {
    val withPayload = df.withColumn("payload",
      encode(col(textCol), "UTF-8"))
      .withColumn("payload_bytes", length(col("payload")).cast("long"))
    val withMeta = withMediaMeta(withPayload, "payload")
    withMeta
      .withColumn("features", stubDecodeFeatures(col("payload")))
      .withColumn("frame_plan",
        sampleFrames(col("media_meta.n_frames"), 10, 16))
  }
}
