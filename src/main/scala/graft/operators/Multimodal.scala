package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: opaque `binary` payloads with typed
  * metadata, batch-wise decode / feature-extract / resize / frame-sample.
  *
  * The Spark-side machinery (schema, partition-wise batch processing,
  * deterministic output grain) is REAL and tested; the media codecs are
  * STUBBED with a deterministic fake (this container has no image/audio
  * libraries) — `decodeStub` derives pseudo-metadata from the bytes'
  * hash. Swap `decodeStub` for a real codec (JNI/FFI per partition) and
  * everything else stands.
  */
object Multimodal {

  /** Typed media row: payload + envelope metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media", BinaryType),
    StructField("mime", StringType),
    StructField("byte_len", LongType)))

  /** Decoded-frame metadata produced by the (stubbed) decoder. */
  final case class DecodedMeta(
      media_id: Long,
      width: Int,
      height: Int,
      n_frames: Int,
      fingerprint: Long)

  /** Wrap a string column as a binary media column (utf-8 payload) —
    * stands in for reading real image/audio bytes.
    */
  def asMedia(df: DataFrame, id: String, payload: String, mime: String): DataFrame =
    df.select(
      col(id).cast("long").as("media_id"),
      encode(col(payload), "UTF-8").as("media"),
      lit(mime).as("mime"),
      length(encode(col(payload), "UTF-8")).cast("long").as("byte_len"))

  /** STUB decoder: deterministic pseudo-metadata from the payload hash.
    * Runs partition-wise over iterator batches — the exact call shape a
    * real codec needs (no per-row JNI setup, bounded memory).
    */
  def decodeStub(media: DataFrame): Dataset[DecodedMeta] = {
    val enc = Encoders.product[DecodedMeta]
    media.select(col("media_id"), col("media"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          // ??? real codec goes here — deterministic fake below
          var h = 1125899906842597L
          var i = 0
          while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
          DecodedMeta(
            media_id = id,
            width = 16 + math.floorMod(h, 1024).toInt,
            height = 16 + math.floorMod(h >> 10, 1024).toInt,
            n_frames = 1 + math.floorMod(h >> 20, 64).toInt,
            fingerprint = h)
        }
      }(enc)
  }

  /** "Resize": deterministic downscale of stub metadata (a real impl
    * maps bytes → bytes per partition; the plan shape is identical).
    */
  def resizeStub(decoded: Dataset[DecodedMeta], maxSide: Int): DataFrame =
    decoded.toDF().select(
      col("media_id"),
      least(col("width"), lit(maxSide)).as("width"),
      least(col("height"), lit(maxSide)).as("height"),
      col("n_frames"), col("fingerprint"))

  /** Frame sampling: split the payload into fixed-size byte windows and
    * emit one row per sampled frame (every `stride`-th window) — the
    * partition/grain story of video-frame extraction, minus the codec.
    */
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int): DataFrame =
    media.select(
      col("media_id"), col("byte_len"),
      posexplode(
        transform(
          sequence(
            lit(0),
            greatest(ceil(col("byte_len") / lit(frameBytes.toDouble)).cast("int") - 1, lit(0))),
          i => substring(col("media"), (i * frameBytes + 1).cast("int"), lit(frameBytes))))
        .as(Seq("frame_no", "frame")))
      .filter(col("frame_no") % stride === 0)
      .select(
        col("media_id"), col("frame_no"),
        length(col("frame")).cast("long").as("frame_bytes"),
        xxhash64(col("frame")).as("frame_hash"))
}
