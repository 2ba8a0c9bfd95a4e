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

  /** REAL image codec over the JDK's `javax.imageio` — public
    * standard-library API, no external dependency. Honors the same
    * expensive-handle contract as [[StubCodec]] (constructed once per
    * partition, reused across rows/batches). PNG/JPEG (+ gif/bmp —
    * whatever the JRE registry ships); audio/video have no JDK codec
    * and stay stubbed.
    */
  final class ImageCodec {
    ImageCodec.inits.incrementAndGet()
    // ImageIO's default image-input-stream is DISK-backed (a temp file
    // per image in java.io.tmpdir): at 32 decode threads that's
    // thousands of create/write/delete round-trips racing the shuffle
    // dirs on the same filesystem, and decode throughput collapses as
    // tmp fills. The payloads are in-memory byte arrays — use the
    // memory-backed stream. (JVM-global, idempotent, thread-safe.)
    javax.imageio.ImageIO.setUseCache(false)

    /** Header-only read: (format, width, height) without decoding
      * pixels — the cheap path [[withMediaMeta]]'s doc describes.
      * None when no registered reader recognizes the bytes.
      */
    def readMeta(bytes: Array[Byte]): Option[(String, Int, Int)] = {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          try {
            r.setInput(iis)
            Some((r.getFormatName.toLowerCase, r.getWidth(0),
              r.getHeight(0)))
          } finally r.dispose()
        }
      } finally iis.close()
    }

    /** Full pixel decode to a dim-float feature vector: mean
      * luminance (ITU-R 601 integer weights) over `dim` vertical
      * strips, scaled to 0..1. None when the bytes aren't an image.
      */
    def decodeFeatures(bytes: Array[Byte], dim: Int)
        : Option[Array[Double]] = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = img.getWidth; val h = img.getHeight
        val sum = new Array[Double](dim)
        val cnt = new Array[Long](dim)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val lum = (((rgb >> 16) & 0xff) * 299 +
              ((rgb >> 8) & 0xff) * 587 + (rgb & 0xff) * 114) / 1000.0
            val d = math.min(dim - 1, x * dim / w)
            sum(d) += lum; cnt(d) += 1
            x += 1
          }
          y += 1
        }
        Some(Array.tabulate(dim)(i =>
          if (cnt(i) > 0) sum(i) / cnt(i) / 255.0 else 0.0))
      }
    }
  }
  object ImageCodec {
    /** Codec constructions in this JVM — specs assert per-partition
      * reuse, same as [[StubCodec.inits]].
      */
    val inits = new java.util.concurrent.atomic.AtomicInteger(0)

    /** Deterministic solid-gray PNG: every pixel is `gray` (0..255),
      * so a correct decode recovers width, height, AND mean luminance
      * = gray exactly (PNG is lossless). Used to plant verifiable
      * image payloads in tests and the oracle query.
      */
    def pngBytes(w: Int, h: Int, gray: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = gray & 0xff
      val rgb = (g << 16) | (g << 8) | g
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { img.setRGB(x, y, rgb); x += 1 }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
  }

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
      .add("decoded_format", StringType)
      .add("decoded_width", IntegerType)
      .add("decoded_height", IntegerType)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val (tw, th) = resizeTo
    df.mapPartitions { it =>
      // both handles once per partition; the REAL javax.imageio codec
      // decodes anything its reader registry recognizes, the stub
      // covers the formats the JDK has no codec for (audio/video)
      val img = new ImageCodec
      val codec = new StubCodec
      it.grouped(batchSize).zipWithIndex.flatMap { case (batch, bi) =>
        batch.map { r =>
          val bytes = r.getAs[Array[Byte]](payloadIdx)
          val meta = r.getAs[org.apache.spark.sql.Row](metaIdx)
          val real = img.readMeta(bytes)
          val feats = real.flatMap(_ =>
              img.decodeFeatures(bytes, featureDim))
            .getOrElse(codec.decode(bytes, featureDim))
          val (sw, sh) = real.map { case (_, w, h) => (w, h) }
            .getOrElse((meta.getAs[Int]("width"),
              meta.getAs[Int]("height")))
          org.apache.spark.sql.Row.fromSeq(r.toSeq ++ Seq(
            feats.toSeq,
            math.min(tw, sw),
            math.min(th, sh),
            bi,
            real.map(_._1).orNull,
            real.map(_._2).map(Int.box).orNull,
            real.map(_._3).map(Int.box).orNull))
        }
      }
    }(enc)
  }

  /** Perceptual DIFFERENCE HASH (dHash, the public aHash/dHash/pHash
    * family's gradient member): decode, nearest-neighbor sample a
    * 9x8 grayscale grid, emit bit (y*8+x) = 1 iff the right neighbor
    * is brighter — 64 bits robust to re-encoding and mild resizing,
    * the standard cheap image near-dup key. All-integer sampling
    * (src = pos * dim div grid) so the hash of a losslessly-coded
    * image is an exact function of its pixels — which is what lets
    * q232 ORACLE-CHECK a real ImageIO decode end to end against
    * planted gradient PNGs whose pixel law is replayed in SQL.
    */
  def dHash64(bytes: Array[Byte]): Long = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    val w = img.getWidth
    val h = img.getHeight
    var hash = 0L
    var y = 0
    while (y < 8) {
      val sy = y * h / 8
      var x = 0
      while (x < 8) {
        val sx0 = x * w / 9
        val sx1 = (x + 1) * w / 9
        // planted PNGs are gray (r=g=b): the blue channel IS the
        // luminance; for color inputs this is the cheap-luma choice
        val g0 = img.getRGB(sx0, sy) & 0xff
        val g1 = img.getRGB(sx1, sy) & 0xff
        if (g1 > g0) hash |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    hash
  }

  /** Column form of [[dHash64]]. */
  val dHashUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((b: Array[Byte]) => dHash64(b))

  /** Deterministic GRADIENT PNG keyed by a pattern id: dims
    * w = 16 + pat mod 13, h = 16 + (3*pat) mod 11, pixel
    * g(x,y) = (3x + 5y + pat) mod 256 — lossless, so decode + any
    * integer-arithmetic derivation (mean, dHash) is replayable in
    * closed form. Unlike the solid-gray plant, gradients give dHash
    * non-trivial bits.
    */
  def plantGradientPng(df: DataFrame, patCol: String): DataFrame = {
    val mk = udf { (pat: Long) =>
      val w = 16 + (pat % 13).toInt
      val h = 16 + (3 * pat % 11).toInt
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val g = ((3 * x + 5 * y + pat) % 256).toInt
          img.setRGB(x, y, (g << 16) | (g << 8) | g)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    df.withColumn("payload", mk(col(patCol).cast("long")))
  }

  /** REAL audio path for the one codec-free mainstream format: WAV /
    * RIFF with 16-bit PCM. Parsing walks the actual chunk structure
    * ("RIFF" header, "fmt " for channels/rate/bits, skip unknown
    * chunks by their declared size, "data" for samples, little-endian
    * throughout) — the same walk a libsndfile does, minus the
    * compressed codecs this environment lacks (those stay stubbed).
    */
  object Wav {
    /** Parsed header + sample count. */
    case class Meta(channels: Int, sampleRate: Int, bits: Int,
        nSamples: Int)

    private def le32(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
        ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
    private def le16(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    private def tag(b: Array[Byte], o: Int): String =
      new String(b, o, 4, "US-ASCII")

    /** Walk the chunk list; returns (meta, dataOffset). */
    def parse(b: Array[Byte]): (Meta, Int) = {
      require(b.length >= 12 && tag(b, 0) == "RIFF" &&
        tag(b, 8) == "WAVE", "wav: not a RIFF/WAVE stream")
      var o = 12
      var meta: Option[(Int, Int, Int)] = None
      while (o + 8 <= b.length) {
        val id = tag(b, o)
        val sz = le32(b, o + 4)
        if (id == "fmt ") {
          require(le16(b, o + 8) == 1, "wav: only PCM supported")
          meta = Some((le16(b, o + 10), le32(b, o + 12),
            le16(b, o + 22)))
        } else if (id == "data") {
          val (ch, rate, bits) = meta.getOrElse(
            throw new IllegalArgumentException("wav: data before fmt"))
          return (Meta(ch, rate, bits, sz / (bits / 8) / ch), o + 8)
        }
        o += 8 + sz + (sz & 1) // chunks are word-aligned
      }
      throw new IllegalArgumentException("wav: no data chunk")
    }

    /** 16-bit mono samples as ints in [-32768, 32767]. */
    def samples(b: Array[Byte]): Array[Int] = {
      val (m, off) = parse(b)
      require(m.bits == 16 && m.channels == 1,
        s"wav: expected 16-bit mono, got ${m.bits}/${m.channels}")
      Array.tabulate(m.nSamples) { i =>
        le16(b, off + 2 * i).toShort.toInt
      }
    }

    /** Minimal 16-bit mono PCM WAV encoder (planting fixtures). */
    def bytes(samples: Array[Int], sampleRate: Int): Array[Byte] = {
      val n = samples.length
      val out = new Array[Byte](44 + 2 * n)
      def w32(o: Int, v: Int): Unit = { out(o) = v.toByte
        out(o + 1) = (v >> 8).toByte; out(o + 2) = (v >> 16).toByte
        out(o + 3) = (v >> 24).toByte }
      def w16(o: Int, v: Int): Unit = { out(o) = v.toByte
        out(o + 1) = (v >> 8).toByte }
      def wTag(o: Int, s: String): Unit =
        s.getBytes("US-ASCII").copyToArray(out, o)
      wTag(0, "RIFF"); w32(4, 36 + 2 * n); wTag(8, "WAVE")
      wTag(12, "fmt "); w32(16, 16); w16(20, 1); w16(22, 1)
      w32(24, sampleRate); w32(28, sampleRate * 2); w16(32, 2)
      w16(34, 16)
      wTag(36, "data"); w32(40, 2 * n)
      var i = 0
      while (i < n) { w16(44 + 2 * i, samples(i) & 0xffff); i += 1 }
      out
    }
  }

  /** Plant a VIDEO-shaped frame sequence: per id, 6 + id mod 5
    * gradient-PNG frames sharing the video's dims (w = 16 + id mod
    * 13, h = 16 + 3id mod 11) with per-frame phase pat = id*1000 +
    * f*29 — real frames, closed pixel law, one row per (id, frame).
    */
  def plantFrames(df: DataFrame, idCol: String): DataFrame = {
    val mk = udf { (id: Long) =>
      val w = 16 + (id % 13).toInt
      val h = 16 + (3 * id % 11).toInt
      (0 until (6 + (id % 5)).toInt).map { f =>
        val pat = id * 1000 + f * 29
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val g = ((3 * x + 5 * y + pat) % 256).toInt
            img.setRGB(x, y, (g << 16) | (g << 8) | g)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        (f, bos.toByteArray)
      }
    }
    df.withColumn("__fr", explode(mk(col(idCol).cast("long"))))
      .select(col(idCol), col("__fr._1").as("frame"),
        col("__fr._2").as("payload"))
  }

  /** SCENE-CUT detection over a decoded frame sequence: dHash every
    * frame (REAL decode), hamming distance to the previous frame of
    * the same video (lag over the per-video window), cut where the
    * distance clears `minBits` — the shot-boundary primitive of
    * video dedup/sampling pipelines. Hashes ride as two 32-bit
    * halves so the integer pipeline (xor + popcount) replays on any
    * engine (q234).
    */
  def sceneCuts(frames: DataFrame, idCol: String,
      payloadCol: String, minBits: Int): DataFrame = {
    require(minBits >= 1 && minBits <= 64, s"sceneCuts: $minBits")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("frame"))
    frames
      .withColumn("__h", dHashUdf(col(payloadCol)))
      .withColumn("h_lo", col("__h").bitwiseAND(lit(0xFFFFFFFFL)))
      .withColumn("h_hi", shiftrightunsigned(col("__h"), 32))
      .withColumn("__plo", lag(col("h_lo"), 1).over(w))
      .withColumn("__phi", lag(col("h_hi"), 1).over(w))
      .where(col("__plo").isNotNull)
      .withColumn("hamming",
        bit_count(col("h_lo").bitwiseXOR(col("__plo"))) +
          bit_count(col("h_hi").bitwiseXOR(col("__phi"))))
      .withColumn("is_cut",
        (col("hamming") >= minBits).cast("int"))
      .select(col(idCol), col("frame").cast("long").as("frame"),
        col("hamming").cast("long").as("hamming"), col("is_cut"))
  }

  /** Plant a deterministic 16-bit mono WAV keyed by a pattern id:
    * n = 2000 + (pat mod 7)*100 samples of
    * s(i) = ((i*37 + pat*101) mod 65536) - 32768 at 16 kHz — a
    * closed law any engine replays, through a REAL RIFF encode.
    */
  def plantWav(df: DataFrame, patCol: String): DataFrame = {
    val mk = udf { (pat: Long) =>
      val n = 2000 + (pat % 7).toInt * 100
      Wav.bytes(Array.tabulate(n)(i =>
        (((i.toLong * 37 + pat * 101) % 65536) - 32768).toInt), 16000)
    }
    df.withColumn("payload", mk(col(patCol).cast("long")))
  }

  /** Windowed audio ENERGY from a real WAV parse: per `window`
    * samples, the exact integer sum of squares (the loudness/
    * silence-detection primitive; RMS = sqrt(sumsq/n) is one float
    * step the caller applies). Integer output keeps the whole decode
    * path hash-verifiable (q233).
    */
  def wavWindowEnergy(df: DataFrame, idCol: String,
      payloadCol: String, window: Int): DataFrame = {
    require(window >= 1, s"wavWindowEnergy: window $window")
    val ss = df.sparkSession
    import ss.implicits._
    val f = udf { (b: Array[Byte]) =>
      Wav.samples(b).grouped(window).zipWithIndex.map {
        case (chunk, w) =>
          var sq = 0L
          var i = 0
          while (i < chunk.length) {
            sq += chunk(i).toLong * chunk(i); i += 1 }
          (w.toLong, chunk.length.toLong, sq)
      }.toSeq
    }
    df.select(col(idCol), explode(f(col(payloadCol))).as("__w"))
      .select(col(idCol), col("__w._1").as("win"),
        col("__w._2").as("n_samples"), col("__w._3").as("sumsq"))
  }

  /** Plant a deterministic solid-gray PNG payload keyed by an id
    * column: width = 16 + id mod 32, height = 16 + (7 * id) mod 29,
    * gray = id mod 256. Runs on executors (the PNG encoder is
    * stateless JDK API); a correct decode recovers all three exactly,
    * which is what makes the image path oracle-checkable.
    */
  def plantPng(df: DataFrame, idCol: String): DataFrame = {
    val mk = udf((id: Long) => ImageCodec.pngBytes(
      16 + (id % 32).toInt, 16 + (7 * id % 29).toInt, (id % 256).toInt))
    df.withColumn("payload", mk(col(idCol).cast("long")))
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
