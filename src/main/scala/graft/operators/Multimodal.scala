package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: opaque `binary` payloads + typed metadata, with
  * batch featurization plumbing (SURVEY/BASELINE north-star item).
  *
  * The Spark-side contract is real — schema, partition-preserving
  * `mapPartitions` batching, output shape. Image DIMENSIONS are real:
  * PNG (IHDR), JPEG (SOF marker scan) and GIF (logical screen
  * descriptor) headers are parsed directly from the payload bytes —
  * public container formats, no codec needed. Only pixel-level
  * featurization (decode/resize/embed) is STUBBED with a
  * deterministic fake (this container has no image/audio codecs; a
  * real deployment swaps `decodeStub`'s feature vector for a JNI /
  * FFI decoder or runs the equivalent `mapInPandas` with PIL/ffmpeg).
  * Non-image payloads (the harness feeds text bytes) keep the stub's
  * byte-derived dimensions. Payload bytes never shuffle: featurize
  * runs scan-side before any exchange, and only the small feature
  * struct flows on.
  */
object Multimodal {

  /** Parsed image header: (format, width, height). */
  final case class ImageHeader(format: String, width: Int, height: Int)

  private def u16be(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def u16le(b: Array[Byte], i: Int): Int =
    ((b(i + 1) & 0xff) << 8) | (b(i) & 0xff)
  private def i32be(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)

  /** Width/height from PNG/JPEG/GIF container headers (format specs:
    * PNG = 8-byte signature + IHDR chunk; JPEG = marker stream, dims in
    * the first SOFn segment; GIF = 6-byte version + logical screen
    * descriptor). None for anything else — malformed or non-image
    * payloads never throw, they just don't decode. */
  def imageHeader(b: Array[Byte]): Option[ImageHeader] = {
    if (b == null) return None
    // PNG: \x89PNG\r\n\x1a\n, IHDR length+type at 8..15, dims at 16/20
    if (b.length >= 24 &&
        (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
        b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')
      return Some(ImageHeader("png", i32be(b, 16), i32be(b, 20)))
    // GIF87a / GIF89a: dims = little-endian u16 pair at offset 6
    if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a')
      return Some(ImageHeader("gif", u16le(b, 6), u16le(b, 8)))
    // JPEG: FFD8, then walk FFxx segments to the first SOFn (C0-CF
    // minus C4/C8/CC which are not frame headers); dims at seg+5/+7
    if (b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
      var i = 2
      while (i + 9 < b.length) {
        if ((b(i) & 0xff) != 0xff) return None // marker desync
        // ITU-T T.81 §B.1.1.2: any number of 0xFF fill bytes may pad
        // before a marker code — skip the run so padding between
        // segments is not misread as desync or a bogus 0xFF marker
        while (i + 2 < b.length && (b(i + 1) & 0xff) == 0xff) i += 1
        if (i + 9 >= b.length) return None
        val m = b(i + 1) & 0xff
        if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7) || m == 0x01) {
          i += 2 // standalone marker, no length field
        } else {
          val len = u16be(b, i + 2)
          if (len < 2) return None
          if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
            if (i + 8 < b.length)
              return Some(ImageHeader("jpeg", u16be(b, i + 7), u16be(b, i + 5)))
            return None
          }
          i += 2 + len
        }
      }
      return None
    }
    None
  }

  /** Parsed audio header (WAV/RIFF): channels, sample rate, bit depth,
    * and duration derived from the data-chunk size. */
  final case class AudioHeader(format: String, channels: Int,
                               sampleRateHz: Int, bitsPerSample: Int,
                               durationMs: Long)

  private def u32le(b: Array[Byte], i: Int): Long =
    ((b(i + 3) & 0xffL) << 24) | ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 1) & 0xffL) << 8) | (b(i) & 0xffL)

  /** WAV (RIFF) header parse — chunk walk from offset 12; `fmt ` gives
    * channels/rate/depth, `data` gives the payload size that fixes the
    * duration. Same never-throws contract as [[imageHeader]]. */
  def audioHeader(b: Array[Byte]): Option[AudioHeader] = {
    if (b == null || b.length < 44) return None
    if (!(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
          b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')) return None
    var channels = 0; var rate = 0; var bits = 0; var dataLen = -1L
    var i = 12
    while (i + 8 <= b.length && (channels == 0 || dataLen < 0)) {
      val id = new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val len = u32le(b, i + 4)
      if (id == "fmt " && i + 8 + 16 <= b.length) {
        channels = u16le(b, i + 10)
        rate = u32le(b, i + 12).toInt
        bits = u16le(b, i + 22)
      } else if (id == "data") {
        dataLen = len
      }
      // chunks are word-aligned: odd sizes carry one pad byte
      i += 8 + len.toInt + (len.toInt & 1)
      if (len < 0 || len > Int.MaxValue - 16) return None
    }
    if (channels <= 0 || rate <= 0 || bits <= 0 || dataLen < 0) None
    else {
      val bytesPerSec = rate.toLong * channels * (bits / 8)
      val durMs = if (bytesPerSec == 0) 0L else dataLen * 1000L / bytesPerSec
      Some(AudioHeader("wav", channels, rate, bits, durMs))
    }
  }

  /** media row schema: payload + sidecar metadata (the usual lakehouse
    * layout for image/audio shards). */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType, nullable = true),
      StructField("source_url", StringType, nullable = true),
      StructField("n_bytes", LongType, nullable = true))), nullable = true)))

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("content_hash", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("feature", ArrayType(FloatType, containsNull = false), nullable = false)))

  /** Decode: REAL header dimensions when the payload is a recognized
    * image container (PNG/JPEG/GIF via [[imageHeader]]); byte-derived
    * stub dimensions otherwise (harness text payloads). The feature
    * vector is the deterministic STUB in both paths — pixel decode
    * needs a codec this container doesn't ship; same signature and
    * batch shape as the real thing. */
  private[operators] def decodeStub(payload: Array[Byte], dim: Int): (Int, Int, Array[Float]) = {
    if (payload == null || payload.isEmpty) (0, 0, Array.fill(dim)(0.0f))
    else {
      val (w, h) = imageHeader(payload) match {
        case Some(hd) => (hd.width, hd.height)
        case None =>
          (16 + (math.abs(payload(0).toInt) % 64),
           16 + (math.abs(payload(payload.length - 1).toInt) % 64))
      }
      val f = new Array[Float](dim)
      var i = 0
      while (i < payload.length) {
        f(i % dim) += (payload(i) & 0xff) / 255.0f
        i += 1
      }
      (w, h, f)
    }
  }

  /** Derive a media table from any (id, string) corpus — the harness
    * stand-in for an image/audio shard (documents.text as the payload
    * bytes). */
  def asMedia(df: DataFrame, idCol: String, blobCol: String,
              modality: String = "image"): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit(modality).as("modality"),
      col(blobCol).cast("binary").as("payload"),
      struct(
        lit("application/octet-stream").as("mime"),
        concat(lit("mem://"), col(idCol).cast("string")).as("source_url"),
        length(col(blobCol)).cast("long").as("n_bytes")).as("meta"))

  /** Batch featurization over partitions: one decode call per row, rows
    * streamed per partition (no per-row task overhead, no shuffle; the
    * real decoder would amortize model/codec init per partition exactly
    * here). */
  def featurize(media: DataFrame, dim: Int = 16): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(featureSchema)
    media.select(col("media_id"), col("modality"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val modality = r.getString(1)
          val payload = r.getAs[Array[Byte]](2)
          val n = if (payload == null) 0L else payload.length.toLong
          val hash = {
            var h = 1125899906842597L
            if (payload != null) { var i = 0; while (i < payload.length) { h = 31 * h + payload(i); i += 1 } }
            h
          }
          val (w, hgt, feat) = decodeStub(payload, dim)
          Row(id, modality, n, hash, w, hgt, feat.toSeq)
        }
      }(enc)
  }
}
