package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Decoded-media record produced by the (stubbed) decoder. */
case class DecodedMedia(
    doc_id: Long,
    media_type: String,
    n_bytes: Int,
    width: Int,
    height: Int,
    n_frames: Int,
    features: Array[Float])

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata.
  *
  * The decode step is REAL for the formats the JVM ships codecs for:
  * PNG/JPEG/BMP/GIF via `javax.imageio` (true width/height plus a
  * luminance-histogram feature vector) and WAV/AIFF/AU via
  * `javax.sound.sampled` (true sample rate/channels/frame count plus
  * an amplitude histogram).  Payloads neither codec parses (video —
  * no pure-JVM codec in this container) fall back to `fakeDecode`, a
  * clearly-marked deterministic stub.
  * Everything around the codec — the binary schema, partition-wise
  * batched `mapPartitions` (one decoder instantiation per partition,
  * the shape a JNI/codec binding needs), and the downstream
  * feature-column contract — is real and tested either way.
  */
object MediaOps {

  /** Build a media table from documents: text bytes stand in for an
    * encoded payload; media_type cycles image/audio/video.
    */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      element_at(lit(Array("image", "audio", "video")),
        (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
      col("text").cast("binary").as("media"))

  /** STUB decoder body — deterministic fake of a codec call. */
  private def fakeDecode(docId: Long, mediaType: String, bytes: Array[Byte]): DecodedMedia = {
    // ??? real decode would go here (e.g. libjpeg/ffmpeg binding);
    // the fake derives stable values from the payload alone.
    val n = bytes.length
    val w = 16 + (n % 640)
    val h = 16 + (n % 480)
    val frames = if (mediaType == "video") 1 + (n % 24) else 1
    val feat = Array.tabulate(8)(i => ((n * (i + 1)) % 251).toFloat / 251f)
    DecodedMedia(docId, mediaType, n, w, h, frames, feat)
  }

  /** REAL pure-JVM image decode for the formats `javax.imageio`
    * bundles readers for (PNG, JPEG, BMP, GIF): true pixel
    * dimensions plus an 8-bin luminance histogram (normalized, on a
    * ≤64×64 sample grid so decode cost is bounded per image) as the
    * feature vector.  Returns None when the payload isn't a parseable
    * image — the caller falls back to the stub.
    */
  private def imageioDecode(docId: Long, mediaType: String,
                            bytes: Array[Byte]): Option[DecodedMedia] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val hist = new Array[Long](8)
        val sx = math.max(1, w / 64)
        val sy = math.max(1, h / 64)
        var n = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val lum = (((rgb >> 16) & 0xFF) * 299 + ((rgb >> 8) & 0xFF) * 587 +
              (rgb & 0xFF) * 114) / 1000
            hist(lum >> 5) += 1
            n += 1
            x += sx
          }
          y += sy
        }
        val feat = hist.map(c => (c.toDouble / n).toFloat)
        Some(DecodedMedia(docId, mediaType, bytes.length, w, h, 1, feat))
      }
    } catch { case _: Exception => None }

  /** REAL pure-JVM audio decode for formats `javax.sound.sampled`
    * bundles readers for (WAV/AIFF/AU): true sample rate, channel
    * count and frame length from the header, plus an 8-bin amplitude
    * histogram over (up to) the first 4096 PCM frames as the feature
    * vector.  The record reuses the image field slots the way a
    * columnar pipeline would: width = sample rate (Hz), height =
    * channels, n_frames = header frame count.  Returns None when the
    * payload isn't parseable audio — the caller falls back to the
    * stub.
    */
  private def audioDecode(docId: Long, mediaType: String,
                          bytes: Array[Byte]): Option[DecodedMedia] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        // AudioSystem.NOT_SPECIFIED (-1) = stream with unknown length
        // (e.g. an AU header with the length field unset): still
        // sample up to the cap so the histogram reflects real PCM
        val nFrames = in.getFrameLength
        val frameSz = math.max(1, fmt.getFrameSize)
        val capFrames = if (nFrames < 0) 4096L else math.min(4096L, nFrames)
        // cap total BYTES, not just frames: frameSize comes from an
        // untrusted header (blockAlign can claim 65535), and
        // frameSz * capFrames could demand a huge or Int-overflowed
        // allocation — OutOfMemoryError is an Error the Exception
        // fallback below would not catch
        val sampleBytes = math.min(frameSz.toLong * capFrames, 1L << 20).toInt
        val sample = new Array[Byte](sampleBytes)
        var off = 0
        var read = 0
        while (off < sample.length && read >= 0) {
          read = in.read(sample, off, sample.length - off)
          if (read > 0) off += read
        }
        val hist = new Array[Long](8)
        var i = 0
        while (i < off) {
          // bucket each byte of PCM payload by amplitude octile —
          // format-agnostic, deterministic, and cheap
          hist(((sample(i) & 0xFF) >> 5)) += 1
          i += 1
        }
        val n = math.max(1L, off.toLong)
        Some(DecodedMedia(docId, mediaType, bytes.length,
          fmt.getSampleRate.toInt, fmt.getChannels,
          (if (nFrames < 0) off.toLong / frameSz else nFrames).toInt,
          hist.map(c => (c.toDouble / n).toFloat)))
      } finally in.close()
    } catch { case _: Exception => None }

  /** Partition-batched decode: the decoder context is created once
    * per partition (the expensive part with a real codec), then
    * streamed over rows — no per-row setup, no driver collect.
    * Real ImageIO / javax.sound decode where the payload parses;
    * stub fallback otherwise.
    */
  def decode(media: DataFrame): Dataset[DecodedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "media_type", "media")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition decoder init would happen here
        rows.map { case (id, mt, bytes) =>
          imageioDecode(id, mt, bytes)
            .orElse(audioDecode(id, mt, bytes))
            .getOrElse(fakeDecode(id, mt, bytes))
        }
      }
  }

  /** Resized-media record produced by the (stubbed) resampler. */
  case class ResizedMedia(
      doc_id: Long,
      media_type: String,
      width: Int,
      height: Int,
      scale_x: Double,
      scale_y: Double,
      resample_fp: Long)

  /** STUB resize (brief: decode / feature-extract / *resize* /
    * frame-sample): a real implementation initializes the resampler
    * per partition and emits the resampled payload; the stub keeps the
    * exact distributed shape — one output row per media item, scale
    * factors computed from true dims, deterministic fingerprint in
    * place of the pixel buffer.
    */
  def resize(decoded: Dataset[DecodedMedia], outW: Int, outH: Int): Dataset[ResizedMedia] = {
    val spark = decoded.sparkSession
    import spark.implicits._
    decoded.mapPartitions { rows =>
      // per-partition resampler init would happen here
      rows.map { m =>
        val fp = (m.doc_id * 1000003L + m.width.toLong * outW + m.height.toLong * outH) &
          0x0FFFFFFFFFFFFFFFL
        ResizedMedia(m.doc_id, m.media_type, outW, outH,
          m.width.toDouble / outW, m.height.toDouble / outH, fp)
      }
    }
  }

  /** Decoded features as an embedding table `(vec_id, v)` — the
    * handoff from the multimodal pipeline into the similarity stack
    * (brute-force / LSH / IVF all consume this shape).
    */
  def mediaEmbeddings(decoded: Dataset[DecodedMedia]): DataFrame =
    decoded.toDF().select(
      col("doc_id").as("vec_id"),
      expr("transform(features, x -> cast(x as double))").as("v"))

  /** Feature extraction surface over decoded media: mean feature +
    * aspect ratio, grouped by media type.
    */
  def mediaStats(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.core.Tables.t(spark, dir, "documents")
    decode(mediaTable(docs)).toDF()
      .groupBy("media_type")
      .agg(count("*").as("n"),
           sum("n_bytes").as("total_bytes"),
           round(avg(col("width").cast("double") / col("height")), 6).as("avg_aspect"))
      .orderBy("media_type")
  }
}
