package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing for training-data pipelines: media content is
  * an opaque `binary` column with typed metadata; decode / feature-extract /
  * resize / frame-sample run as partition-local transforms over batches of
  * binary payloads.
  *
  * The Spark-side machinery here — schema, partitioning, batch shape — is
  * real and tested. The codec step itself is STUBBED with a deterministic
  * fake (`FakeDecoder`): image/audio libraries are not in this container, so
  * `RealDecoder.decode` is `???` behind the same interface. Swapping in a
  * real implementation (JNI codecs, or Arrow-batched python workers via
  * `mapInPandas` on a PySpark front) changes no plumbing.
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

  /** The real codec boundary — intentionally unimplemented in this container
    * (no image/audio libs). */
  object RealDecoder extends Decoder {
    override def decode(meta: MediaMeta, content: Array[Byte]): MediaFeatures2 =
      ??? // requires image/audio codecs not present in this environment
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

  /** Bucket media by kind + size-class for balanced downstream partitions
    * (skew control: giant videos don't co-locate with thumbnails). */
  def repartitionBySize(df: DataFrame, partitions: Int): DataFrame =
    df.withColumn("size_class",
        when(length(col("content")) < 1024, "s")
          .when(length(col("content")) < 1024 * 1024, "m")
          .otherwise("l"))
      .repartition(partitions, col("meta.kind"), col("size_class"))
}
