package graft.multimodal

import java.io.File

/** Deterministic on-disk media fixture: one PNG and one WAV per id, written
  * once under the system temp dir and reused by every JVM (Verify, Bench,
  * specs). The BYTES are pure functions of the id, so concurrent writers
  * race benignly (temp file + atomic rename, hidden `.`-prefixed temp names
  * that Hadoop's default PathFilter ignores) and every reader sees identical
  * files — the oracle can state each file's planted properties in SQL over
  * the `documents` table alone.
  *
  * This is the REAL-FILE leg of the multimodal surface: queries read these
  * payloads back through `spark.read.format("binaryFile")` (see
  * [[Multimodal.fromBinaryFiles]] / graft.sources.MediaFileSourceConfig),
  * so the decode/hash pipeline runs over genuine on-disk bytes, not
  * in-query synthesized arrays.
  */
object MediaFixture {

  /** Deterministic 16×16 gray PNG through the JDK's real PNG encoder: the
    * bit pattern comes from `id % 20` (the planted duplicate class) and a
    * small uniform brightness shift from `id / 20` — every ~20th file is a
    * brightness-jittered near-copy, not a byte-identical one, so only a
    * PERCEPTUAL hash (not a byte hash) reproduces the planted groups. */
  def pngBytes(id: Long): Array[Byte] = {
    val pattern = (id % 20).toInt
    val bright = ((id / 20) % 3).toInt * 4
    val im = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < 16) {
      var x = 0
      while (x < 16) {
        val h = (1103515245L * (pattern * 256 + y * 16 + x) + 12345L) / 65536L
        val v = (if ((h % 2 + 2) % 2 == 1) 200 else 40) + bright
        im.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "png", bos)
    bos.toByteArray
  }

  /** Planted WAV parameters, stated arithmetically so a DuckDB oracle can
    * re-derive them from the id alone. 8-bit mono PCM → byteRate == rate,
    * and rate·durMs/1000 is always integral, so the sniffed duration is
    * EXACTLY the planted one. */
  def wavRate(id: Long): Int = 8000 * (1 + (id % 3)).toInt
  def wavDurationMs(id: Long): Int = 100 * (1 + (id % 5)).toInt

  /** Deterministic RIFF/WAVE file: 8-bit mono PCM, planted rate/duration,
    * LCG-filled sample data (content depends on the id, so byte-level
    * hashes differ across ids). */
  def wavBytes(id: Long): Array[Byte] = {
    val rate = wavRate(id)
    val n = rate * wavDurationMs(id) / 1000 // samples == data bytes (8-bit mono)
    val out = new Array[Byte](44 + n)
    def putAscii(o: Int, s: String): Unit =
      s.getBytes("US-ASCII").zipWithIndex.foreach { case (b, i) => out(o + i) = b }
    def putLeInt(o: Int, v: Int): Unit = {
      out(o) = v.toByte; out(o + 1) = (v >>> 8).toByte
      out(o + 2) = (v >>> 16).toByte; out(o + 3) = (v >>> 24).toByte
    }
    def putLeShort(o: Int, v: Int): Unit = {
      out(o) = v.toByte; out(o + 1) = (v >>> 8).toByte
    }
    putAscii(0, "RIFF"); putLeInt(4, 36 + n); putAscii(8, "WAVE")
    putAscii(12, "fmt "); putLeInt(16, 16)
    putLeShort(20, 1) // PCM
    putLeShort(22, 1) // mono
    putLeInt(24, rate)
    putLeInt(28, rate) // byteRate = rate · 1 channel · 1 byte/sample
    putLeShort(32, 1) // blockAlign
    putLeShort(34, 8) // bits/sample
    putAscii(36, "data"); putLeInt(40, n)
    var h = id * 6364136223846793005L + 1442695040888963407L
    var i = 0
    while (i < n) {
      h = h * 6364136223846793005L + 1442695040888963407L
      out(44 + i) = (h >>> 56).toByte
      i += 1
    }
    out
  }

  /** Planted GVID video parameters, arithmetically stated for the oracle:
    * frame count varies with the id (so videos are ragged), while frame
    * CONTENT is keyed on (id mod 10, frame index) — every ~10th video is a
    * frame-for-frame duplicate, the structure the frame-dedup query must
    * reproduce from disk. */
  val GvidFps = 30
  val GvidFrameLen = 64
  def gvidFrameCount(id: Long): Int = 4 + (id % 3).toInt
  def gvidContentKey(id: Long): Long = id % 10

  /** One fixed-length frame, LCG-filled from the (content key, index) pair
    * — distinct pairs give distinct frames, equal pairs identical ones. */
  def frameBytes(key: Long, idx: Int): Array[Byte] = {
    val out = new Array[Byte](GvidFrameLen)
    var h = (key * 97L + idx) * 6364136223846793005L + 1442695040888963407L
    var i = 0
    while (i < GvidFrameLen) {
      h = h * 6364136223846793005L + 1442695040888963407L
      out(i) = (h >>> 56).toByte
      i += 1
    }
    out
  }

  /** Deterministic GVID frame container (see
    * [[Multimodal.FrameContainer]]). */
  def gvidBytes(id: Long): Array[Byte] =
    Multimodal.FrameContainer.pack(
      (0 until gvidFrameCount(id)).map(j => frameBytes(gvidContentKey(id), j)),
      GvidFps)

  /** Write any missing fixture files for `ids` and return the fixture root.
    * Layout: `<root>/png/doc_<id>.png`, `<root>/wav/doc_<id>.wav`,
    * `<root>/gvid/doc_<id>.gvid`. */
  def ensure(ids: Seq[Long]): String = {
    val root = new File(sys.props("java.io.tmpdir"), "graft_media_fixture_v1")
    val png = new File(root, "png"); val wav = new File(root, "wav")
    val gvid = new File(root, "gvid")
    png.mkdirs(); wav.mkdirs(); gvid.mkdirs()
    require(png.isDirectory && wav.isDirectory && gvid.isDirectory,
      s"media fixture dirs not creatable under $root")
    ids.foreach { id =>
      writeIfMissing(new File(png, f"doc_$id%05d.png"), pngBytes(id))
      writeIfMissing(new File(wav, f"doc_$id%05d.wav"), wavBytes(id))
      writeIfMissing(new File(gvid, f"doc_$id%05d.gvid"), gvidBytes(id))
    }
    root.getAbsolutePath
  }

  /** Atomic publish: write to a `.`-prefixed temp (invisible to Hadoop file
    * listings) then rename; a concurrent writer losing the rename race is
    * fine because both wrote identical bytes. */
  private def writeIfMissing(f: File, bytes: Array[Byte]): Unit =
    if (!f.exists()) {
      val tmp = File.createTempFile("." + f.getName + ".", ".tmp", f.getParentFile)
      java.nio.file.Files.write(tmp.toPath, bytes)
      if (!tmp.renameTo(f)) {
        tmp.delete()
        require(f.exists(), s"could not publish media fixture file $f")
      }
    }
}
