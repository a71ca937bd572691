package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing for training-data pipelines: media content is
  * an opaque `binary` column with typed metadata; decode / feature-extract /
  * resize / frame-sample run as partition-local transforms over batches of
  * binary payloads.
  *
  * The Spark-side machinery — schema, partitioning, batch shape — is real
  * and tested, and so is the decode step for the formats the JDK itself
  * ships codecs for: [[RealDecoder]] decodes PNG/JPEG/GIF/BMP pixels via
  * `javax.imageio` (with a deterministic integer area-average 8×8 luma
  * thumbnail) and WAV audio via `javax.sound.sampled` (sample rate,
  * channels, exact frame-count duration); [[MediaSniffer]] extracts typed
  * metadata (dimensions, sample rate, duration) from raw container headers
  * without decoding any payload. Formats beyond the JDK's codecs (video,
  * non-WAV audio) fall back to byte-level features behind the same
  * interface — swapping in JNI codecs or Arrow-batched python workers via
  * `mapInPandas` changes no plumbing.
  *
  * At 100 TB: payloads stay columnar-binary end to end (parquet binary
  * pages), decode is a narrow per-partition map (no shuffle), and feature
  * outputs are fixed-width arrays — the layout a large media pipeline needs.
  */
object Multimodal {

  /** Typed metadata carried beside the opaque payload. */
  final case class MediaMeta(
      kind: String, // image | audio | video
      mimeType: String,
      width: Int, // pixels (image/video) or 0
      height: Int,
      sampleRate: Int, // Hz (audio) or 0
      durationMs: Long)

  final case class MediaRecord(
      mediaId: Long,
      meta: MediaMeta,
      content: Array[Byte])

  /** Extracted features: fixed-width, columnar-friendly. */
  final case class MediaFeatures(
      mediaId: Long,
      kind: String,
      nBytes: Long,
      byteEntropy: Double,
      histogram: Array[Long], // 16-bucket byte histogram
      thumbnail: Array[Byte]) // decoded+resized payload (stub: truncated bytes)

  val mediaSchema: StructType = Encoders.product[MediaRecord].schema

  /** The decode seam. Implementations must be pure per-record functions so
    * the surrounding `mapPartitions` stays a narrow transform. */
  trait Decoder extends Serializable {
    def decode(meta: MediaMeta, content: Array[Byte]): MediaFeatures2
  }

  /** Decoder output before id attachment. */
  final case class MediaFeatures2(
      nBytes: Long, byteEntropy: Double, histogram: Array[Long], thumbnail: Array[Byte])

  /** Deterministic fake decoder: byte histogram + entropy + truncated
    * "thumbnail". Stands in for the real codec (STUB — see class doc). */
  object FakeDecoder extends Decoder {
    override def decode(meta: MediaMeta, content: Array[Byte]): MediaFeatures2 = {
      val hist = new Array[Long](16)
      content.foreach(b => hist((b & 0xff) >> 4) += 1)
      val n = content.length.toDouble.max(1.0)
      val entropy = -hist.filter(_ > 0).map { c =>
        val p = c / n
        p * math.log(p) / math.log(2)
      }.sum
      MediaFeatures2(content.length.toLong, entropy, hist, content.take(64))
    }
  }

  /** Real decode over the JDK's own codecs: images through `javax.imageio`
    * (PNG/JPEG/GIF/BMP pixel decode + deterministic integer area-average
    * 8×8 luma thumbnail — no Graphics2D interpolation, whose rounding is
    * JVM-dependent), WAV audio through `javax.sound.sampled`. Anything the
    * JDK cannot decode (video containers, compressed audio) degrades to the
    * byte-level features so the operator never throws on foreign bytes. */
  object RealDecoder extends Decoder {
    override def decode(meta: MediaMeta, content: Array[Byte]): MediaFeatures2 = {
      val base = FakeDecoder.decode(meta, content) // histogram/entropy/nBytes
      MediaSniffer.sniff(content).kind match {
        case "image" => decodeImage(content).getOrElse(base)
        case _ => base
      }
    }

    /** 8×8 luma thumbnail from real decoded pixels: integer area-average of
      * ITU-R BT.601 luma (scaled by 1000 to stay integral until the final
      * division), deterministic on every JVM. */
    private[multimodal] def decodeImage(content: Array[Byte]): Option[MediaFeatures2] = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
      Option(img).map { im =>
        val (w, h) = (im.getWidth, im.getHeight)
        val thumb = new Array[Byte](64)
        var ty = 0
        while (ty < 8) {
          var tx = 0
          while (tx < 8) {
            val x0 = tx * w / 8; val x1 = math.max((tx + 1) * w / 8, x0 + 1)
            val y0 = ty * h / 8; val y1 = math.max((ty + 1) * h / 8, y0 + 1)
            var sum = 0L; var cnt = 0L
            var y = y0
            while (y < h && y < y1) {
              var x = x0
              while (x < w && x < x1) {
                val rgb = im.getRGB(x, y)
                val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
                sum += 299L * r + 587L * g + 114L * b // BT.601 luma × 1000
                cnt += 1
                x += 1
              }
              y += 1
            }
            thumb(ty * 8 + tx) = (if (cnt == 0) 0 else (sum / (cnt * 1000L))).toByte
            tx += 1
          }
          ty += 1
        }
        val base = FakeDecoder.decode(
          MediaMeta("image", "", w, h, 0, 0L), content)
        MediaFeatures2(base.nBytes, base.byteEntropy, base.histogram, thumb)
      }
    }

    /** Decoded WAV parameters via the JDK sound stack (exact frame count). */
    private[multimodal] def decodeWav(content: Array[Byte]): Option[(Int, Int, Long)] =
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(content))
        try {
          val f = in.getFormat
          val frames = in.getFrameLength
          val durMs = if (f.getSampleRate > 0 && frames >= 0)
            (frames * 1000L) / f.getSampleRate.toLong else 0L
          Some((f.getSampleRate.toInt, f.getChannels, durMs))
        } finally in.close()
      } catch { case _: Exception => None }
  }

  /** Perceptual image hashing over REAL decoded pixels — the image-dedup
    * primitive of a multimodal training pipeline (exact-duplicate and
    * near-duplicate image removal keys on this, the same way text dedup
    * keys on shingle hashes). */
  object ImageHash {

    /** 64-bit average hash (aHash): decode → [[RealDecoder]]'s integer 8×8
      * area-average luma thumbnail → bit i set iff luma_i > the integer
      * mean. Strict comparison: a flat image hashes to 0. Exactly invariant
      * under uniform brightness shifts (+c on every gray pixel adds c to
      * every thumbnail cell AND to the integer mean), and deterministic on
      * every JVM (no float resize). None when the bytes do not decode as an
      * image. Pair with [[graft.ops.NearDup.hammingPairs]] (totalBits = 64)
      * for banded near-duplicate search at scale. */
    def aHash64(imageBytes: Array[Byte]): Option[Long] =
      RealDecoder.decodeImage(imageBytes).map { f =>
        val t = f.thumbnail.map(b => (b & 0xff).toLong)
        val mean = t.sum / 64L
        t.zipWithIndex.foldLeft(0L) { case (acc, (v, i)) =>
          if (v > mean) acc | (1L << i) else acc
        }
      }
  }

  /** Partition-local feature extraction: narrow map, no shuffle; the decoder
    * is initialized once per partition (the per-executor-resource shape a
    * real codec needs). */
  def extractFeatures(
      ds: Dataset[MediaRecord],
      decoder: Decoder = FakeDecoder): Dataset[MediaFeatures] = {
    implicit val enc: Encoder[MediaFeatures] = Encoders.product[MediaFeatures]
    ds.mapPartitions { rows =>
      val d = decoder // per-partition init point for heavyweight codecs
      rows.map { r =>
        val f = d.decode(r.meta, r.content)
        MediaFeatures(r.mediaId, r.meta.kind, f.nBytes, f.byteEntropy, f.histogram, f.thumbnail)
      }
    }
  }

  /** Typed-metadata extraction from raw container headers — no payload
    * decode, a few dozen byte reads per record, usable as a narrow map over
    * billions of rows to populate the `meta` column from bare bytes. */
  object MediaSniffer extends Serializable {

    private def beShort(b: Array[Byte], o: Int): Int =
      ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
    private def beInt(b: Array[Byte], o: Int): Int =
      ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
        ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
    private def leShort(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    private def leInt(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
        ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
    private def ascii(b: Array[Byte], o: Int, n: Int): String =
      new String(b, o, n, "US-ASCII")

    val unknown: MediaMeta = MediaMeta("binary", "application/octet-stream", 0, 0, 0, 0L)

    /** Sniff kind/mime/dimensions/rate/duration from the header bytes. */
    def sniff(b: Array[Byte]): MediaMeta = {
      if (b.length >= 24 && (b(0) & 0xff) == 0x89 && ascii(b, 1, 3) == "PNG")
        // IHDR is always the first chunk: width/height big-endian at 16/20
        MediaMeta("image", "image/png", beInt(b, 16), beInt(b, 20), 0, 0L)
      else if (b.length >= 10 && ascii(b, 0, 4) == "GIF8")
        MediaMeta("image", "image/gif", leShort(b, 6), leShort(b, 8), 0, 0L)
      else if (b.length >= 26 && ascii(b, 0, 2) == "BM")
        MediaMeta("image", "image/bmp", leInt(b, 18), math.abs(leInt(b, 22)), 0, 0L)
      else if (b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8)
        sniffJpeg(b)
      else if (b.length >= 12 && ascii(b, 0, 4) == "RIFF" && ascii(b, 8, 4) == "WAVE")
        sniffWav(b)
      else if (FrameContainer.isValid(b))
        MediaMeta("video", "video/x-graft-frames", 0, 0, 0,
          FrameContainer.durationMs(b))
      else unknown
    }

    /** Walk JPEG segments to the first SOF0/1/2 frame header. */
    private def sniffJpeg(b: Array[Byte]): MediaMeta = {
      var o = 2
      while (o + 9 < b.length && (b(o) & 0xff) == 0xff) {
        val marker = b(o + 1) & 0xff
        if (marker >= 0xc0 && marker <= 0xc2)
          return MediaMeta("image", "image/jpeg", beShort(b, o + 7), beShort(b, o + 5), 0, 0L)
        if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd9)) o += 2 // bare markers
        else o += 2 + beShort(b, o + 2)
      }
      MediaMeta("image", "image/jpeg", 0, 0, 0, 0L)
    }

    /** Walk RIFF chunks: fmt → sample rate/byte rate, data → duration.
      * Chunk lengths come from untrusted bytes — a length that would step
      * backwards or past the buffer ends the walk instead of looping. */
    private def sniffWav(b: Array[Byte]): MediaMeta = {
      var o = 12
      var rate = 0; var byteRate = 0; var dataLen = -1L
      var done = false
      while (!done && o + 8 <= b.length) {
        val id = ascii(b, o, 4)
        val len = leInt(b, o + 4).toLong & 0xffffffffL
        if (id == "fmt " && o + 24 <= b.length) {
          rate = leInt(b, o + 12)
          byteRate = leInt(b, o + 16)
        } else if (id == "data") dataLen = len
        val step = 8L + len + (len & 1L) // chunks are word-aligned
        if (o + step > b.length) done = true else o += step.toInt
      }
      val durMs = if (byteRate > 0 && dataLen >= 0) dataLen * 1000L / byteRate else 0L
      MediaMeta("audio", "audio/wav", 0, 0, rate, durMs)
    }
  }

  /** binaryFile scan → typed media rows: `media_id` parsed from the file
    * name (first capture group of `idPattern`), typed `meta` sniffed from
    * the on-disk header bytes, `content` the raw payload. Everything is a
    * narrow map over the scan — at 100 TB the files list across executors
    * and no payload ever shuffles. Input is the fixed binaryFile schema
    * (path, modificationTime, length, content). */
  def fromBinaryFiles(df: DataFrame, idPattern: String = "(\\d+)"): DataFrame =
    sniffMeta(df.select(
        regexp_extract(element_at(split(col("path"), "/"), -1), idPattern, 1)
          .cast("long").as("media_id"),
        col("content")))
      .select("media_id", "meta", "content")

  /** Populate typed metadata from the binary column itself (narrow map). */
  def sniffMeta(df: DataFrame, contentCol: String = "content"): DataFrame = {
    val sniffUdf = udf { (content: Array[Byte]) =>
      if (content == null) MediaSniffer.unknown else MediaSniffer.sniff(content)
    }
    df.withColumn("meta", sniffUdf(col(contentCol)))
  }

  /** Minimal deterministic frame container ("GVID"): 16-byte header —
    * magic, frame length, frame count, fps (all big-endian) — followed by
    * the fixed-length frames concatenated. Stands in for a real video
    * container: the JDK ships no video demuxer (the documented offline
    * seam — an FFmpeg/JNI demuxer drops in behind [[sampleFrames]]'s
    * signature), but the SAMPLING machinery — stride selection, bounded
    * output, partition-local byte slicing, exploded (frame_idx, frame)
    * rows — is the real engine plumbing a video pipeline runs. */
  object FrameContainer extends Serializable {
    val HeaderLen = 16
    private def beInt(b: Array[Byte], o: Int): Int =
      ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
        ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
    private def putInt(b: Array[Byte], o: Int, v: Int): Unit = {
      b(o) = (v >>> 24).toByte; b(o + 1) = (v >>> 16).toByte
      b(o + 2) = (v >>> 8).toByte; b(o + 3) = v.toByte
    }

    def pack(frames: Seq[Array[Byte]], fps: Int = 30): Array[Byte] = {
      require(frames.nonEmpty, "pack needs at least one frame")
      require(fps > 0, s"fps must be positive, got $fps")
      val len = frames.head.length
      require(len > 0 && frames.forall(_.length == len),
        "all frames must share one positive length")
      val out = new Array[Byte](HeaderLen + len * frames.size)
      out(0) = 'G'; out(1) = 'V'; out(2) = 'I'; out(3) = 'D'
      putInt(out, 4, len); putInt(out, 8, frames.size); putInt(out, 12, fps)
      frames.zipWithIndex.foreach { case (f, i) =>
        System.arraycopy(f, 0, out, HeaderLen + i * len, len)
      }
      out
    }

    /** Structurally valid GVID: magic + header fields consistent with the
      * payload length (truncated/corrupt containers are NOT valid — the
      * sampler must never slice out of bounds on untrusted bytes). */
    def isValid(b: Array[Byte]): Boolean =
      b != null && b.length >= HeaderLen &&
        b(0) == 'G' && b(1) == 'V' && b(2) == 'I' && b(3) == 'D' && {
          val len = beInt(b, 4); val n = beInt(b, 8); val fps = beInt(b, 12)
          len > 0 && n > 0 && fps > 0 &&
            b.length.toLong == HeaderLen.toLong + len.toLong * n
        }

    def frameCount(b: Array[Byte]): Int = beInt(b, 8)
    def fps(b: Array[Byte]): Int = beInt(b, 12)
    def durationMs(b: Array[Byte]): Long =
      frameCount(b).toLong * 1000L / fps(b)

    /** Every-`every`-th frame starting at 0, capped at `maxFrames` —
      * returned as (frame index, frame bytes). Non-GVID / corrupt payloads
      * yield no frames (images and audio flow through the same column). */
    def sampleFrames(b: Array[Byte], every: Int, maxFrames: Int): Seq[(Int, Array[Byte])] = {
      if (!isValid(b)) return Seq.empty
      val len = beInt(b, 4); val n = beInt(b, 8)
      (0 until n by every).take(maxFrames).map { i =>
        i -> java.util.Arrays.copyOfRange(b, HeaderLen + i * len, HeaderLen + (i + 1) * len)
      }
    }
  }

  /** Frame sampling over a binary column: each GVID payload explodes into
    * its sampled (frame_idx, frame) rows, all other columns carried; rows
    * whose payload is not a frame container contribute nothing. A pure
    * narrow partition-local map + explode — no shuffle; at 100 TB the
    * per-payload output is bounded by `maxFrames` regardless of how long
    * any single video is (the skew guard a frame pipeline needs). */
  def frameSample(df: DataFrame, contentCol: String = "content",
      every: Int = 1, maxFrames: Int = 64): DataFrame = {
    require(every >= 1, s"every must be >= 1, got $every")
    require(maxFrames >= 1, s"maxFrames must be >= 1, got $maxFrames")
    val sampleUdf = udf { (content: Array[Byte]) =>
      FrameContainer.sampleFrames(content, every, maxFrames)
    }
    df.withColumn("__f", explode(sampleUdf(col(contentCol))))
      .withColumn("frame_idx", col("__f._1").cast("long"))
      .withColumn("frame", col("__f._2"))
      .drop("__f", contentCol)
  }

  /** Bucket media by kind + size-class for balanced downstream partitions
    * (skew control: giant videos don't co-locate with thumbnails). */
  def repartitionBySize(df: DataFrame, partitions: Int): DataFrame =
    df.withColumn("size_class",
        when(length(col("content")) < 1024, "s")
          .when(length(col("content")) < 1024 * 1024, "m")
          .otherwise("l"))
      .repartition(partitions, col("meta.kind"), col("size_class"))
}
