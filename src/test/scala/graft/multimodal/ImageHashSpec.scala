package graft.multimodal

import graft.SparkSpec

/** Perceptual image hashing: aHash is brightness-invariant and
  * pattern-sensitive, and composes with NearDup.hammingPairs into banded
  * image near-dup search. */
class ImageHashSpec extends SparkSpec {

  /** 16×16 gray PNG where pixel (x,y) is bright iff `bright(x,y)`. */
  private def png(brightAt: (Int, Int) => Boolean, shift: Int = 0): Array[Byte] = {
    val im = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 16) {
      val v = (if (brightAt(x, y)) 200 else 40) + shift
      im.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "png", bos)
    bos.toByteArray
  }

  private def hash(b: Array[Byte]): Long =
    Multimodal.ImageHash.aHash64(b).get

  behavior of "Multimodal.ImageHash.aHash64"

  it should "be exactly invariant under uniform brightness shifts" in {
    val base = png((x, _) => x >= 8)
    hash(png((x, _) => x >= 8, shift = 12)) shouldBe hash(base)
    hash(png((x, _) => x >= 8, shift = -24)) shouldBe hash(base)
  }

  it should "separate different patterns and spot small edits nearby" in {
    val left = hash(png((x, _) => x >= 8)) // right half bright
    val top = hash(png((_, y) => y >= 8)) // bottom half bright
    left should not be top
    java.lang.Long.bitCount(left ^ top) should be >= 16
    // one flipped 2x2 pixel block = one thumbnail cell: hamming 1
    val edited = hash(png((x, y) => x >= 8 || (x < 2 && y < 2)))
    java.lang.Long.bitCount(left ^ edited) shouldBe 1
  }

  it should "return None for bytes that are not an image" in {
    Multimodal.ImageHash.aHash64("not a png".getBytes) shouldBe None
  }

  it should "feed banded image near-dup search through hammingPairs" in {
    import spark.implicits._
    val imgs = Seq(
      1L -> png((x, _) => x >= 8),
      2L -> png((x, _) => x >= 8, shift = 8), // brightness copy: hamming 0
      3L -> png((x, y) => x >= 8 || (x < 2 && y < 2)), // small edit: hamming 1
      4L -> png((_, y) => y >= 8)) // different pattern
      .map { case (id, b) => (id, hash(b)) }
      .toDF("doc_id", "ahash")
    val pairs = graft.ops.NearDup.hammingPairs(imgs, "doc_id", "ahash",
        totalBits = 64, bands = 8, maxHamming = 7)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    pairs should contain(1L -> 2L)
    pairs should contain(1L -> 3L)
    pairs should contain(2L -> 3L)
    pairs.flatMap(p => Set(p._1, p._2)) should not contain 4L
  }
}
