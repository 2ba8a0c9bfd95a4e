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

  /** Stub codec standing in for a real image/audio library handle:
    * expensive to construct (a real libjpeg/ffmpeg context), so the
    * batched decode constructs it ONCE PER PARTITION and reuses it
    * across batches — the contract [[decodeBatched]] enforces.
    * Deterministic: features are a byte-polynomial so tests and the
    * rows-only query are stable.
    */
  final class StubCodec {
    StubCodec.inits.incrementAndGet()
    /** "Decode" one payload to a dim-float feature vector. */
    def decode(bytes: Array[Byte], dim: Int): Array[Double] = {
      val out = new Array[Double](dim)
      var i = 0
      while (i < bytes.length) {
        val d = i % dim
        out(d) = (out(d) * 31.0 + (bytes(i) & 0xff)) % 1000.0
        i += 1
      }
      out.map(_ / 1000.0)
    }
  }
  object StubCodec {
    /** Codec constructions in this JVM — specs assert reuse (at most
      * one per partition, never one per row or per batch).
      */
    val inits = new java.util.concurrent.atomic.AtomicInteger(0)
  }

  /** Batched per-partition decode — the Scala analog of a pandas
    * mapInPandas decode stage, and the shape a REAL codec drops into:
    *
    *   - one codec init per PARTITION (not per row — library contexts
    *     are expensive);
    *   - rows processed in batches of `batchSize` (the vectorized
    *     decode unit; a real impl hands each batch to the codec in one
    *     call);
    *   - resize expressed as target dims clamped to the source dims,
    *     emitted alongside the features.
    *
    * Input needs `payload` (binary) and `media_meta` (from
    * [[withMediaMeta]]). Output adds features, resized dims, and the
    * batch index within the partition (observable batch shape).
    */
  def decodeBatched(df: DataFrame, featureDim: Int = 8,
      batchSize: Int = 64, resizeTo: (Int, Int) = (224, 224))
      : DataFrame = {
    val inSchema = df.schema
    val payloadIdx = inSchema.fieldIndex("payload")
    val metaIdx = inSchema.fieldIndex("media_meta")
    val outSchema = inSchema
      .add("features", ArrayType(DoubleType, containsNull = false))
      .add("resized_width", IntegerType)
      .add("resized_height", IntegerType)
      .add("decode_batch", IntegerType)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val (tw, th) = resizeTo
    df.mapPartitions { it =>
      val codec = new StubCodec // once per partition
      it.grouped(batchSize).zipWithIndex.flatMap { case (batch, bi) =>
        batch.map { r =>
          val bytes = r.getAs[Array[Byte]](payloadIdx)
          val meta = r.getAs[org.apache.spark.sql.Row](metaIdx)
          val feats = codec.decode(bytes, featureDim)
          org.apache.spark.sql.Row.fromSeq(r.toSeq ++ Seq(
            feats.toSeq,
            math.min(tw, meta.getAs[Int]("width")),
            math.min(th, meta.getAs[Int]("height")),
            bi))
        }
      }
    }(enc)
  }

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
