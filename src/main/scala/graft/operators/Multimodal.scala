package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: opaque `binary` payloads + typed metadata, with
  * batch featurization plumbing (SURVEY/BASELINE north-star item).
  *
  * The Spark-side contract is real — schema, partition-preserving
  * `mapPartitions` batching, output shape — while the media decode
  * itself is STUBBED with a deterministic fake (this container has no
  * image/audio codecs; a real deployment swaps `decodeStub` for a JNI /
  * FFI decoder or runs the equivalent `mapInPandas` with PIL/ffmpeg).
  * Payload bytes never shuffle: featurize runs scan-side before any
  * exchange, and only the small feature struct flows on.
  */
object Multimodal {

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

  /** STUB decode: deterministic pseudo-features from the payload bytes.
    * Stands in for image decode / resize / frame-sample; same signature
    * and batch shape as the real thing. */
  private[operators] def decodeStub(payload: Array[Byte], dim: Int): (Int, Int, Array[Float]) = {
    if (payload == null || payload.isEmpty) (0, 0, Array.fill(dim)(0.0f))
    else {
      val w = 16 + (math.abs(payload(0).toInt) % 64)
      val h = 16 + (math.abs(payload(payload.length - 1).toInt) % 64)
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
