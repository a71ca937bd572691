package graft.sources

import graft.SparkSpec
import graft.multimodal.{MediaFixture, Multimodal}
import graft.runner.GraftConfig
import org.apache.spark.sql.streaming.Trigger

import java.nio.file.Files

/** Real-file media ingestion: the binaryFile media source must hand the
  * pipeline genuine on-disk bytes — listing, media_id parsing, header
  * sniffing and perceptual hashing all verified against files this spec
  * plants itself (plus the shared fixture's planted arithmetic).
  */
class MediaSourceSpec extends SparkSpec {

  behavior of "media file source"

  it should "dispatch from config and read on-disk payload bytes verbatim" in {
    val ids = Seq(3L, 17L, 42L)
    val root = MediaFixture.ensure(ids)
    val src = SourceConfig("mm", GraftConfig(Array("job"),
      s"""sources.mm.connector = media
         |sources.mm.path = $root/png
         |sources.mm.path.glob.filter = *.png
         |""".stripMargin))
    src shouldBe a[MediaFileSourceConfig]
    val rows = src.read(spark, batchMode = true)
      .select("media_id", "content").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    rows.keySet should contain allElementsOf ids
    // byte-for-byte what MediaFixture wrote: the scan adds/drops nothing
    ids.foreach { id => rows(id) shouldBe MediaFixture.pngBytes(id) }
  }

  it should "sniff typed metadata matching the planted file properties" in {
    val ids = Seq(5L, 6L)
    val root = MediaFixture.ensure(ids)
    val src = MediaFileSourceConfig("mm", root, glob = None,
      idPattern = "(\\d+)", recursive = true,
      watermarkColumn = None, maxLateness = "5 minutes")
    val metas = src.read(spark, batchMode = true)
      .select("media_id", "meta.kind", "meta.width", "meta.sampleRate", "meta.durationMs")
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        (r.getInt(2), r.getInt(3), r.getLong(4))).toMap
    ids.foreach { id =>
      metas((id, "image")) shouldBe ((16, 0, 0L))
      metas((id, "audio")) shouldBe
        ((0, MediaFixture.wavRate(id), MediaFixture.wavDurationMs(id).toLong))
    }
  }

  it should "hash identically from disk and from memory (same planted groups)" in {
    val ids = 0L until 40L // two full mod-20 duplicate classes
    val root = MediaFixture.ensure(ids)
    val fromDisk = MediaFileSourceConfig("mm", s"$root/png", Some("*.png"),
        "(\\d+)", recursive = false, None, "5 minutes")
      .read(spark, batchMode = true)
      .select("media_id", "content").collect()
      .map(r => r.getLong(0) ->
        Multimodal.ImageHash.aHash64(r.getAs[Array[Byte]](1)).get).toMap
    ids.foreach { id =>
      fromDisk(id) shouldBe Multimodal.ImageHash.aHash64(MediaFixture.pngBytes(id)).get
      // planted structure: same mod-20 class ⇒ same perceptual hash even
      // though the id/20 brightness jitter changes the on-disk bytes
      fromDisk(id) shouldBe fromDisk(id % 20)
    }
  }

  it should "demux planted frame containers read from disk" in {
    // same content key (3 mod 10): frame-for-frame duplicates — but ragged
    // counts (3 -> 4 frames, 23 -> 6), so only doc 23 has a frame 4
    val ids = Seq(3L, 23L)
    val root = MediaFixture.ensure(ids)
    // the fixture root is SHARED (other tests/queries plant more ids
    // there) — restrict to this test's two videos
    val media = MediaFileSourceConfig("mm", s"$root/gvid", Some("*.gvid"),
        "(\\d+)", recursive = false, None, "5 minutes")
      .read(spark, batchMode = true)
      .filter(org.apache.spark.sql.functions.col("media_id").isin(ids: _*))
    // sniffed as video with the planted exact duration
    val kinds = media.select("media_id", "meta.kind", "meta.durationMs")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    ids.foreach { id =>
      kinds(id) shouldBe (("video",
        MediaFixture.gvidFrameCount(id).toLong * 1000L / MediaFixture.GvidFps))
    }
    // frame sampling over the on-disk payloads: stride-2 indexes, planted
    // bytes verbatim, and the two videos' shared frames are IDENTICAL
    val frames = Multimodal.frameSample(media, "content", every = 2, maxFrames = 4)
      .select("media_id", "frame_idx", "frame").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Array[Byte]](2)).toMap
    frames.keys.toSet shouldBe Set((3L, 0L), (3L, 2L), (23L, 0L), (23L, 2L), (23L, 4L))
    frames((3L, 0L)) shouldBe MediaFixture.frameBytes(3L, 0)
    frames((3L, 2L)) shouldBe frames((23L, 2L))
    frames((23L, 4L)) shouldBe MediaFixture.frameBytes(3L, 4)
  }

  it should "stream new files through the same declaration" in {
    val dir = graft.SparkSpec.tempDir("graft-media-stream")
    Seq(1L, 2L).foreach { id =>
      Files.write(java.nio.file.Paths.get(dir, f"doc_$id%05d.png"),
        MediaFixture.pngBytes(id))
    }
    val stream = MediaFileSourceConfig("mm", dir, Some("*.png"),
        "(\\d+)", recursive = false, None, "5 minutes")
      .read(spark, batchMode = false)
    stream.isStreaming shouldBe true
    val q = stream.selectExpr("media_id", "meta.kind AS kind",
        "CAST(length(content) AS BIGINT) AS n")
      .writeStream.format("memory").queryName("graft_media_stream")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val rows = spark.table("graft_media_stream").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    rows.map(_._1).sorted shouldBe Array(1L, 2L)
    rows.foreach { case (id, kind, n) =>
      kind shouldBe "image"
      n shouldBe MediaFixture.pngBytes(id).length.toLong
    }
  }
}
