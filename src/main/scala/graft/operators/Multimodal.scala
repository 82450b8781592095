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

  /** Pluggable decoder contract. Implementations are shipped to
    * executors (Serializable) and invoked partition-wise through
    * [[decode]]: `open()` once per partition (JNI/FFI codec setup,
    * native buffers), `decodeOne` per row, `close()` on exhaustion —
    * the exact lifecycle a real libavcodec/libjpeg binding needs,
    * with bounded memory and no per-row setup.
    */
  trait MediaCodec extends Serializable {
    def open(): Unit = ()
    def decodeOne(mediaId: Long, bytes: Array[Byte]): DecodedMeta
    def close(): Unit = ()
  }

  /** Deterministic fake codec — this container has no image/audio
    * libraries, so metadata is derived from the payload's hash. The
    * REAL part is everything around it: swap in a JNI codec and the
    * schema, partitioning, and batch shape all stand. A real codec
    * holding native state must be a CLASS instance (one per decode()
    * call), NOT an `object`: a Scala object deserializes to the
    * executor-wide singleton, so concurrent tasks would share one
    * native handle and one task's close() would free it mid-decode
    * under another. The stateless stub is safe as a singleton.
    */
  object StubCodec extends MediaCodec {
    override def decodeOne(mediaId: Long, bytes: Array[Byte]): DecodedMeta = {
      var h = 1125899906842597L
      var i = 0
      while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
      DecodedMeta(
        media_id = mediaId,
        width = 16 + math.floorMod(h, 1024).toInt,
        height = 16 + math.floorMod(h >> 10, 1024).toInt,
        n_frames = 1 + math.floorMod(h >> 20, 64).toInt,
        fingerprint = h)
    }
  }

  /** Partition-wise decode through any [[MediaCodec]]: one codec
    * lifecycle per partition, one `decodeOne` per row. `close()` runs
    * exactly once, via the task-completion listener — which also fires
    * on early termination (limit/take) and on failure, where an
    * exhaustion-triggered close would leak a native codec; the
    * idempotence flag guards the no-TaskContext fallback (plain local
    * iteration in tests).
    */
  def decode(media: DataFrame, codec: MediaCodec): Dataset[DecodedMeta] = {
    val enc = Encoders.product[DecodedMeta]
    media.select(col("media_id"), col("media"))
      // null payloads (e.g. a null source column wrapped by asMedia)
      // AND null ids (an uncastable string id nulls through asMedia's
      // long cast) drop here rather than NPE-ing inside the codec or
      // Row.getLong — matching the corrupt-input-drops convention of
      // the rest of the pipeline
      .filter(col("media").isNotNull && col("media_id").isNotNull)
      .mapPartitions { rows =>
        codec.open()
        val closed = new java.util.concurrent.atomic.AtomicBoolean(false)
        def closeOnce(): Unit = if (closed.compareAndSet(false, true)) codec.close()
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => closeOnce()))
        new Iterator[DecodedMeta] {
          override def hasNext: Boolean = {
            val more = rows.hasNext
            if (!more) closeOnce()
            more
          }
          override def next(): DecodedMeta = {
            val r = rows.next()
            codec.decodeOne(r.getLong(0), r.getAs[Array[Byte]](1))
          }
        }
      }(enc)
  }

  /** Decode with the deterministic stub codec. */
  def decodeStub(media: DataFrame): Dataset[DecodedMeta] = decode(media, StubCodec)

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
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int): DataFrame = {
    require(frameBytes >= 1, s"frameBytes must be >= 1, got $frameBytes")
    // stride = 0 would make `frame_no % stride` NULL and silently drop
    // every row; fail fast instead
    require(stride >= 1, s"stride must be >= 1, got $stride")
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
}
