package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Chunking invariants: full coverage (token spans tile the document),
  * exact overlap, single chunk for short docs, non-empty last chunk. */
class ChunkingSpec extends SparkSpec {

  private def docsOf(texts: (Long, String)*) = {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark) // normFused needs graft_words
    texts.toSeq.toDF("doc_id", "text")
  }

  behavior of "Chunking.chunks"

  it should "emit one chunk for a doc at or under the chunk size" in {
    val words = (1 to 64).map(i => s"w$i").mkString(" ")
    val out = Chunking.chunks(docsOf(1L -> words, 2L -> "a b c")).collect()
    out.count(_.getLong(0) == 1L) shouldBe 1
    out.count(_.getLong(0) == 2L) shouldBe 1
    out.find(_.getLong(0) == 1L).get.getLong(2) shouldBe 64L
    out.find(_.getLong(0) == 2L).get.getLong(2) shouldBe 3L
  }

  it should "tile longer docs with stride 48 and a never-empty last chunk" in {
    // 200 tokens: starts 0,48,96,144 → last covers [144,200) = 56 tokens
    val words = (1 to 200).map(i => s"w$i").mkString(" ")
    val out = Chunking.chunks(docsOf(7L -> words))
      .orderBy("chunk_no").collect()
    out.map(_.getLong(1)).toSeq shouldBe Seq(0L, 1L, 2L, 3L)
    out.map(_.getLong(2)).toSeq shouldBe Seq(64L, 64L, 64L, 56L)
    // coverage: last start + last len == n, and the second-to-last chunk
    // did NOT already reach the end (no redundant trailing chunk)
    3 * 48 + 56 shouldBe 200
    2 * 48 + 64 should be < 200
  }

  it should "give identical md5 for identical token spans (chunk-level dedup key)" in {
    val w = (1 to 120).map(i => s"t$i").mkString(" ")
    val out = Chunking.chunks(docsOf(1L -> w, 2L -> w)).collect()
    val byDoc = out.groupBy(_.getLong(0)).view
      .mapValues(_.sortBy(_.getLong(1)).map(_.getString(3)).toSeq)
    byDoc(1L) shouldBe byDoc(2L)
  }

  it should "agree with the arithmetic mirror across sampled geometries" in {
    // ties the scalacheck chunk-count formula (AlgorithmProperties) to the
    // REAL operator: same counts and lengths from Chunking.chunks itself
    def mirror(n: Long, c: Int, s: Int): Long =
      (math.max(n - c, 0L) + s - 1) / s + 1
    val geoms = Seq((1, 64, 48), (63, 64, 48), (64, 64, 48), (65, 64, 48),
      (200, 64, 48), (331, 100, 33), (10, 10, 10), (11, 10, 10), (97, 7, 3))
    geoms.foreach { case (n, c, s) =>
      val words = (1 to n).map(i => s"w$i").mkString(" ")
      val out = Chunking.chunks(docsOf(1L -> words), c, s)
        .orderBy("chunk_no").collect()
      withClue(s"(n=$n,c=$c,s=$s): ") {
        out.length.toLong shouldBe mirror(n.toLong, c, s)
        out.map(_.getLong(2)).sum shouldBe
          (out.length - 1).toLong * c + math.min(c, n - (out.length - 1) * s)
      }
    }
  }

  it should "drop null-text docs instead of emitting junk rows" in {
    import spark.implicits._
    val docs = Seq((1L, Option("a b c")), (2L, Option.empty[String]))
      .toDF("doc_id", "text")
    val out = Chunking.chunks(docs).collect()
    out.map(_.getLong(0)).toSeq shouldBe Seq(1L)
  }

  it should "respect a custom chunk/stride geometry" in {
    val w = (1 to 25).map(i => s"x$i").mkString(" ")
    val out = Chunking.chunks(docsOf(1L -> w), chunkTokens = 10, stride = 5)
      .orderBy("chunk_no").collect()
    // starts 0,5,10,15 → [15,25) = 10 tokens reaches the end
    out.map(_.getLong(1)).toSeq shouldBe Seq(0L, 1L, 2L, 3L)
    out.map(_.getLong(2)).toSeq shouldBe Seq(10L, 10L, 10L, 10L)
  }
}
