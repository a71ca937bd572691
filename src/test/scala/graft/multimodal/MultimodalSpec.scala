package graft.multimodal

import graft.SparkSpec
import graft.multimodal.Multimodal.{MediaMeta, MediaRecord, MediaSniffer, RealDecoder}
import org.apache.spark.sql.functions._

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

/** The REAL decode path: JDK codecs (javax.imageio / javax.sound.sampled)
  * behind the same Decoder seam, and header sniffing straight off the
  * container bytes — dimensions, sample rate, duration — with no payload
  * decode. Every payload here is produced by the JDK's own encoders, so the
  * spec is self-contained. */
class MultimodalSpec extends SparkSpec {

  private def png(w: Int, h: Int)(rgb: (Int, Int) => Int): Array[Byte] = {
    val im = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) im.setRGB(x, y, rgb(x, y))
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "png", bos)
    bos.toByteArray
  }

  private def imageBytes(fmt: String, w: Int, h: Int): Array[Byte] = {
    val im = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) im.setRGB(x, y, 0x406080)
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, fmt, bos)
    bos.toByteArray
  }

  private def wav(rate: Float, seconds: Int): Array[Byte] = {
    val fmtA = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
    val nFrames = (rate * seconds).toInt
    val pcm = new Array[Byte](nFrames * 2)
    val in = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmtA, nFrames.toLong)
    val bos = new ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(in,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  behavior of "MediaSniffer"

  it should "read PNG dimensions from the IHDR chunk" in {
    val m = MediaSniffer.sniff(png(16, 8)((_, _) => 0xffffff))
    m.kind shouldBe "image"
    m.mimeType shouldBe "image/png"
    m.width shouldBe 16
    m.height shouldBe 8
  }

  it should "read JPEG/GIF/BMP dimensions from their headers" in {
    val jm = MediaSniffer.sniff(imageBytes("jpg", 24, 10))
    (jm.mimeType, jm.width, jm.height) shouldBe (("image/jpeg", 24, 10))
    val gm = MediaSniffer.sniff(imageBytes("gif", 12, 5))
    (gm.mimeType, gm.width, gm.height) shouldBe (("image/gif", 12, 5))
    val bm = MediaSniffer.sniff(imageBytes("bmp", 7, 9))
    (bm.mimeType, bm.width, bm.height) shouldBe (("image/bmp", 7, 9))
  }

  it should "read WAV sample rate and duration from RIFF chunks" in {
    val m = MediaSniffer.sniff(wav(8000f, 2))
    m.kind shouldBe "audio"
    m.mimeType shouldBe "audio/wav"
    m.sampleRate shouldBe 8000
    m.durationMs shouldBe 2000L
  }

  it should "fall back to binary for foreign bytes" in {
    MediaSniffer.sniff("just some text".getBytes("UTF-8")).kind shouldBe "binary"
    MediaSniffer.sniff(Array.emptyByteArray).kind shouldBe "binary"
  }

  it should "terminate on malformed RIFF chunk lengths" in {
    // a WAV header whose first chunk claims a length far past the buffer
    val junk = "RIFF1234WAVEfmt ".getBytes("US-ASCII") ++
      Array[Byte](-1, -1, -1, -1) ++ Array.fill[Byte](16)(0)
    val m = MediaSniffer.sniff(junk) // must return, not loop
    m.kind shouldBe "audio"
  }

  behavior of "RealDecoder (JDK codecs)"

  it should "decode real pixels into the deterministic 8x8 luma thumbnail" in {
    // solid color: every thumbnail cell is the exact integer BT.601 luma
    val solid = png(32, 32)((_, _) => (100 << 16) | (150 << 8) | 200)
    val luma = (299L * 100 + 587L * 150 + 114L * 200) / 1000L // = 140
    val f = RealDecoder.decode(MediaSniffer.sniff(solid), solid)
    f.thumbnail.length shouldBe 64
    all(f.thumbnail.map(_ & 0xff).toSeq) shouldBe luma.toInt
    // left half black / right half white: first 4 thumbnail columns 0, last 4 255
    val split = png(32, 32)((x, _) => if (x < 16) 0x000000 else 0xffffff)
    val t = RealDecoder.decode(MediaSniffer.sniff(split), split).thumbnail
    for (row <- 0 until 8; c <- 0 until 4) (t(row * 8 + c) & 0xff) shouldBe 0
    for (row <- 0 until 8; c <- 4 until 8) (t(row * 8 + c) & 0xff) shouldBe 255
  }

  it should "decode WAV format parameters exactly" in {
    RealDecoder.decodeWav(wav(16000f, 1)) shouldBe Some((16000, 1, 1000L))
  }

  it should "degrade to byte-level features on undecodable payloads" in {
    val junk = Array.tabulate[Byte](64)(i => i.toByte)
    val f = RealDecoder.decode(MediaSniffer.unknown, junk)
    f.nBytes shouldBe 64L
    f.histogram.sum shouldBe 64L
  }

  behavior of "sniffMeta over a binary DataFrame column"

  it should "populate the typed meta column as a narrow map" in {
    import spark.implicits._
    val df = Seq(
      (1L, png(16, 8)((_, _) => 0x123456)),
      (2L, wav(8000f, 1)),
      (3L, "plain".getBytes("UTF-8"))).toDF("media_id", "content")
    val rows = Multimodal.sniffMeta(df)
      .select(col("media_id"), col("meta.kind"), col("meta.width"), col("meta.sampleRate"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2), r.getInt(3)))).toMap
    rows(1L) shouldBe (("image", 16, 0))
    rows(2L) shouldBe (("audio", 0, 8000))
    rows(3L) shouldBe (("binary", 0, 0))
  }

  it should "run the real decoder through the partition-local extract" in {
    import org.apache.spark.sql.{Encoder, Encoders}
    implicit val enc: Encoder[MediaRecord] = Encoders.product[MediaRecord]
    val payload = png(16, 16)((_, _) => 0xffffff)
    val ds = spark.createDataset(Seq(
      MediaRecord(7L, MediaSniffer.sniff(payload), payload)))
    val out = Multimodal.extractFeatures(ds, RealDecoder).collect()
    out.head.mediaId shouldBe 7L
    all(out.head.thumbnail.map(_ & 0xff).toSeq) shouldBe 255 // white luma
  }

  behavior of "FrameContainer + frameSample"

  private def frames(n: Int, len: Int): Seq[Array[Byte]] =
    (0 until n).map(i => Array.tabulate(len)(j => (i * 31 + j).toByte))

  it should "sample every k-th frame with exact bytes and bounded output" in {
    val fs = frames(10, 8)
    val video = Multimodal.FrameContainer.pack(fs, fps = 5)
    Multimodal.FrameContainer.frameCount(video) shouldBe 10
    Multimodal.FrameContainer.durationMs(video) shouldBe 2000L
    val sampled = Multimodal.FrameContainer.sampleFrames(video, every = 3, maxFrames = 16)
    sampled.map(_._1) shouldBe Seq(0, 3, 6, 9)
    sampled.foreach { case (i, b) => b.toSeq shouldBe fs(i).toSeq }
    // the cap bounds any single payload's output (the skew guard)
    Multimodal.FrameContainer.sampleFrames(video, every = 1, maxFrames = 4)
      .map(_._1) shouldBe Seq(0, 1, 2, 3)
  }

  it should "yield nothing for non-container and corrupt payloads" in {
    Multimodal.FrameContainer.sampleFrames("not video".getBytes, 1, 8) shouldBe empty
    Multimodal.FrameContainer.sampleFrames(null, 1, 8) shouldBe empty
    // header claims more frames than the payload holds: truncated = invalid
    val truncated = Multimodal.FrameContainer.pack(frames(4, 8)).dropRight(8)
    Multimodal.FrameContainer.sampleFrames(truncated, 1, 8) shouldBe empty
  }

  it should "explode sampled frames over a DataFrame, carrying other columns" in {
    import spark.implicits._
    val video = Multimodal.FrameContainer.pack(frames(6, 4), fps = 3)
    val df = Seq((1L, video), (2L, "plain bytes".getBytes)).toDF("media_id", "content")
    val out = Multimodal.frameSample(df, every = 2, maxFrames = 8)
      .select("media_id", "frame_idx", "frame").collect()
    out.map(r => (r.getLong(0), r.getLong(1))).toSeq shouldBe
      Seq((1L, 0L), (1L, 2L), (1L, 4L)) // non-video row 2 contributes nothing
    out.head.getAs[Array[Byte]](2).toSeq shouldBe frames(6, 4).head.toSeq
  }

  it should "sniff the frame container as video with its duration" in {
    val video = Multimodal.FrameContainer.pack(frames(30, 2), fps = 10)
    val m = MediaSniffer.sniff(video)
    (m.kind, m.mimeType, m.durationMs) shouldBe
      (("video", "video/x-graft-frames", 3000L))
  }
}
