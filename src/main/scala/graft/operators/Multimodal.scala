package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: opaque `binary` payloads with typed
  * metadata, batch-wise decode / feature-extract / resize / frame-sample.
  *
  * The Spark-side machinery (schema, partition-wise batch processing,
  * deterministic output grain) is REAL and tested, and so is the image
  * path: [[JdkImageCodec]] / [[resizeImages]] decode and re-encode
  * PNG/JPEG/BMP/GIF through the JDK's own `javax.imageio` — zero
  * external libraries, pixel-content fingerprints, loud failure on
  * undecodable bytes. [[StubCodec]] remains for the DuckDB-oracled
  * gate queries (an oracle cannot decode PNG, so q31/q32 pin the
  * byte-hash fake) and as the template for exotic formats that DO need
  * a JNI codec — the [[MediaCodec]] lifecycle is built for those.
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

  /** REAL image codec with ZERO external dependencies: the JDK's own
    * `javax.imageio` registry decodes PNG, JPEG, BMP, GIF, and WBMP out
    * of the box — no native libraries, nothing to install on
    * executors. Dimensions come from the decoded raster and the
    * fingerprint hashes the ARGB pixel values row-major (a CONTENT
    * hash: two encodings of the same pixels fingerprint identically,
    * which byte-level hashing cannot do). Undecodable bytes fail
    * LOUDLY with the media id — route corrupt payloads to a quarantine
    * upstream rather than silently fabricating metadata (the stub's
    * behavior, which exists for codec-less test environments).
    *
    * A class, not an object, per the [[StubCodec]] note — ImageIO
    * readers are cheap per call and this holds no native state, but
    * keeping the one-instance-per-decode() discipline means swapping
    * in a stateful JNI codec later changes nothing structurally.
    */
  final class JdkImageCodec extends MediaCodec {
    override def decodeOne(mediaId: Long, bytes: Array[Byte]): DecodedMeta = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      require(img != null,
        s"media $mediaId: bytes are not a JDK-decodable image (png/jpeg/bmp/gif)")
      var h = 1125899906842597L
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) { h = 31 * h + img.getRGB(x, y); x += 1 }
        y += 1
      }
      DecodedMeta(mediaId, img.getWidth, img.getHeight, n_frames = 1, fingerprint = h)
    }
  }

  /** Decode with the real JDK image codec. */
  def decodeImages(media: DataFrame): Dataset[DecodedMeta] = decode(media, new JdkImageCodec)

  /** REAL bytes→bytes resize, partition-wise: decode (JDK registry),
    * downscale so the longer side is ≤ `maxSide` (aspect preserved,
    * bilinear; never upscales), re-encode as PNG. Returns
    * (media_id, media, mime, byte_len) — the same envelope shape
    * [[asMedia]] produces, so resized output feeds any downstream
    * media operator unchanged. Map-side at any scale: one image in
    * memory per row per task, no shuffle.
    */
  def resizeImages(media: DataFrame, maxSide: Int): DataFrame = {
    require(maxSide >= 1, s"maxSide must be >= 1, got $maxSide")
    val out = media.select(col("media_id"), col("media"))
      .filter(col("media").isNotNull && col("media_id").isNotNull)
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          require(img != null,
            s"media $id: bytes are not a JDK-decodable image (png/jpeg/bmp/gif)")
          val (w, h) = (img.getWidth, img.getHeight)
          val scale = math.min(1.0, maxSide.toDouble / math.max(w, h))
          val (nw, nh) = (math.max(1, math.round(w * scale).toInt),
            math.max(1, math.round(h * scale).toInt))
          val outImg = new java.awt.image.BufferedImage(
            nw, nh, java.awt.image.BufferedImage.TYPE_INT_ARGB)
          val g = outImg.createGraphics()
          try {
            g.setRenderingHint(
              java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, nw, nh, null); ()
          } finally g.dispose()
          val buf = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(outImg, "png", buf)
          (id, buf.toByteArray)
        }
      }(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    out.select(
      col("_1").as("media_id"),
      col("_2").as("media"),
      lit("image/png").as("mime"),
      length(col("_2")).cast("long").as("byte_len"))
  }

  /** Decoded-audio metadata ([[decodeWav]]). */
  final case class AudioMeta(
      media_id: Long,
      sample_rate: Int,
      channels: Int,
      n_samples: Long,
      fingerprint: Long)

  /** REAL audio decode, zero external dependencies: the JDK's
    * `javax.sound.sampled` parses WAV/AIFF/AU containers. Emits the
    * format envelope (sample rate, channels, frame count) plus a
    * fingerprint over the decoded PCM bytes — a content hash of the
    * samples, not the container. Undecodable bytes fail loudly with
    * the media id (quarantine upstream), matching [[JdkImageCodec]].
    * Map-side: one stream per row per task, no shuffle.
    */
  def decodeWav(media: DataFrame): Dataset[AudioMeta] = {
    val enc = Encoders.product[AudioMeta]
    media.select(col("media_id"), col("media"))
      .filter(col("media").isNotNull && col("media_id").isNotNull)
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val in =
            try javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(bytes))
            catch {
              case e: javax.sound.sampled.UnsupportedAudioFileException =>
                throw new IllegalArgumentException(
                  s"media $id: bytes are not a JDK-decodable audio stream (wav/aiff/au)", e)
            }
          try {
            val fmt = in.getFormat
            var h = 1125899906842597L
            val buf = new Array[Byte](64 << 10)
            var n = in.read(buf)
            while (n > 0) {
              var i = 0
              while (i < n) { h = 31 * h + buf(i); i += 1 }
              n = in.read(buf)
            }
            AudioMeta(id, fmt.getSampleRate.toInt, fmt.getChannels, in.getFrameLength, h)
          } finally in.close()
        }
      }(enc)
  }

  /** PERCEPTUAL AVERAGE-HASH (aHash, 64-bit) per image — REAL
    * pixel-level near-dup fingerprinting: decode (JDK registry),
    * integer-luminance (299/587/114 per mille) AREA MEANS over an 8×8
    * block grid, bit i set when block i's mean luminance is at or
    * above the global mean. Every comparison is CROSS-MULTIPLIED
    * exact long arithmetic (blockSum · totalArea ≥ totalSum ·
    * blockArea) — no float rounding, so the hash is bit-identical on
    * any JVM and INVARIANT under lossless re-encodes (the PNG
    * round-trip property pinned in MultimodalJdkSpec). Map-side at
    * any scale: one image per row per task, no shuffle.
    *
    * Output: (media_id, ahash). Compose with
    * [[Dedup.hammingPairs64]] for banded near-dup pairs — see
    * [[imageNearDupPairs]].
    */
  def averageHash64(media: DataFrame): DataFrame = {
    val out = media.select(col("media_id"), col("media"))
      .filter(col("media").isNotNull && col("media_id").isNotNull)
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          require(img != null,
            s"media $id: bytes are not a JDK-decodable image (png/jpeg/bmp/gif)")
          (id, AHash.ahash64(img))
        }
      }(Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
    out.select(col("_1").as("media_id"), col("_2").as("ahash"))
  }

  private[operators] object AHash {
    def ahash64(img: java.awt.image.BufferedImage): Long = {
      val w = img.getWidth
      val h = img.getHeight
      // the exact cross-multiplied comparison below needs
      // blockSum·totalArea inside int64: blockSum ≤ (area/64+edges)·
      // 255000, so pixels² · ~4000 must stay under 2^63 — 2^25 pixels
      // (33 MP) leaves 2× headroom. Bigger inputs should resize first.
      require(w.toLong * h <= (1L << 25),
        s"averageHash64: image $w x $h exceeds 2^25 pixels — downscale first " +
          "(resizeImages) to keep the exact integer comparison in int64")
      // per-block luminance sums over the floor(i·w/8) grid — exact
      // integer block boundaries, every pixel in exactly one block
      val sums = new Array[Long](64)
      val areas = new Array[Long](64)
      var y = 0
      while (y < h) {
        val by = (y.toLong * 8 / h).toInt
        var x = 0
        while (x < w) {
          val bx = (x.toLong * 8 / w).toInt
          val rgb = img.getRGB(x, y)
          val lum = ((rgb >> 16) & 0xff) * 299L + ((rgb >> 8) & 0xff) * 587L +
            (rgb & 0xff) * 114L
          val b = by * 8 + bx
          sums(b) += lum
          areas(b) += 1L
          x += 1
        }
        y += 1
      }
      var total = 0L
      var i = 0
      while (i < 64) { total += sums(i); i += 1 }
      val totalArea = w.toLong * h
      var bits = 0L
      i = 0
      while (i < 64) {
        // block mean >= global mean, cross-multiplied exactly; an
        // empty block (image smaller than 8×8 in a dimension) reads
        // as mean 0 → bit clear unless the whole image is black too
        val set =
          if (areas(i) == 0L) total == 0L
          else sums(i) * totalArea >= total * areas(i)
        if (set) bits |= (1L << i)
        i += 1
      }
      bits
    }
  }

  /** Image NEAR-DUP pairs: [[averageHash64]] fingerprints through
    * [[Dedup.hammingPairs64]]'s pigeonhole-complete band blocking —
    * pixel-level duplicate detection (re-encodes, minor edits) with
    * no all-pairs comparison. Output: (id_a, id_b, hamming).
    */
  def imageNearDupPairs(
      media: DataFrame,
      maxHamming: Int = 6,
      maxBlockSize: Int = 10000): DataFrame = {
    val sigs = averageHash64(media)
    Dedup.hammingPairs64(sigs, col("media_id"), col("ahash"),
      maxHamming = maxHamming, maxBlockSize = maxBlockSize)
  }

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

  /** CONTENT-ADDRESSED FIXED-SIZE CHUNKING — the storage layer of a
    * blob/document lake: payloads split into fixed chunks, each
    * addressed by its PORTABLE md5 (engine-replayable, unlike
    * xxhash64's seed detail), with the corpus-wide reference count
    * per chunk — the dedup-ratio audit a content-addressed store
    * runs before ingesting a new batch. Chunk boundaries are
    * character offsets (both engines' `substring`/`length` are
    * character-based, so the chunks are identical strings and the
    * hashes identical hex).
    *
    * Scale shape: the explode is bounded by Σ⌈len/chunk⌉ (linear in
    * corpus bytes), the ref count is one partial-aggregable groupBy
    * on the 16-byte hash, and the join back is hash-partitioned on
    * the same key. Output: (doc_id, chunk_idx, offset, length,
    * chunk_md5, refs).
    */
  def fixedChunks(
      df: DataFrame,
      id: Column,
      text: Column,
      chunkChars: Int): DataFrame = {
    require(chunkChars > 0, s"chunkChars must be > 0, got $chunkChars")
    val chunks = df
      .select(id.as("doc_id"), text.as("t"))
      .filter(col("t").isNotNull && length(col("t")) > 0)
      .select(col("doc_id"),
        explode(sequence(lit(0L),
          expr(s"CAST((length(t) - 1) div $chunkChars AS BIGINT)"))).as("chunk_idx"),
        col("t"))
      .select(col("doc_id"), col("chunk_idx"),
        (col("chunk_idx") * chunkChars).as("offset"),
        substring_index_free(col("t"), col("chunk_idx"), chunkChars))
      .select(col("doc_id"), col("chunk_idx"), col("offset"),
        length(col("chunk")).cast("long").as("length"),
        md5(col("chunk").cast("binary")).as("chunk_md5"))
    val refs = chunks.groupBy(col("chunk_md5")).agg(count(lit(1)).as("refs"))
    chunks.join(refs, Seq("chunk_md5"))
      .select(col("doc_id"), col("chunk_idx"), col("offset"), col("length"),
        col("chunk_md5"), col("refs"))
  }

  // substring with a COLUMN start: the builtin wrapper takes literal
  // ints only
  private def substring_index_free(t: Column, idx: Column, w: Int): Column =
    t.substr((idx * w + 1).cast("int"), lit(w)).as("chunk")
}
