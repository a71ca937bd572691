package graft.ops

import graft.SparkSpec

/** Span-level exact-substring removal: duplicated k-gram spans are removed
  * keeping the first occurrence, overlapping windows merge coverage,
  * within-doc repeats count, short exact-duplicate docs dedup whole. */
class SpanDedupSpec extends SparkSpec {

  private def rewrite(k: Int, docs: (Long, String)*): Map[Long, (Long, Long, String)] = {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    graft.util.CacheBin.withScope {
      SpanDedup.rewrite(docs.toDF("doc_id", "text"), "doc_id", "text", k)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
        .toMap
    }
  }

  behavior of "SpanDedup.rewrite"

  it should "remove a cross-doc span from the later doc only, merging overlapping windows" in {
    val out = rewrite(3,
      1L -> "alpha beta gamma delta epsilon",
      2L -> "zero one alpha beta gamma delta epsilon nine")
    // doc 1 is the canonical (lowest doc_id) occurrence: untouched
    out(1L) shouldBe ((5L, 5L, "alpha beta gamma delta epsilon"))
    // doc 2's windows at positions 2,3,4 duplicate doc 1's 0,1,2; their
    // merged coverage is tokens 2..6, so only the flanks survive
    out(2L) shouldBe ((8L, 3L, "zero one nine"))
  }

  it should "remove a within-doc repeated span, keeping the earlier occurrence" in {
    val out = rewrite(3, 3L -> "red green blue x red green blue")
    // window at pos 4 repeats pos 0 -> tokens 4..6 dropped
    out(3L) shouldBe ((7L, 4L, "red green blue x"))
  }

  it should "dedup whole short documents via the whole-text window fallback" in {
    val out = rewrite(3,
      4L -> "tiny pair",
      5L -> "tiny pair",
      6L -> "other words")
    out(4L) shouldBe ((2L, 2L, "tiny pair")) // canonical copy survives
    out(5L) shouldBe ((2L, 0L, ""))          // duplicate fully removed
    out(6L) shouldBe ((2L, 2L, "other words"))
  }

  it should "leave unique documents untouched and normalize their text" in {
    val out = rewrite(3, 7L -> "A Completely UNIQUE sentence, without repeats!")
    out(7L) shouldBe ((6L, 6L, "a completely unique sentence without repeats"))
  }

  it should "treat two adjacent duplicated spans as one merged hole" in {
    // doc 9 contains doc 8's span twice back to back: every window inside
    // the doubled region is duplicated (against doc 8 or itself), so the
    // whole region is removed
    val out = rewrite(3,
      8L -> "p q r",
      9L -> "start p q r p q r finish")
    out(8L) shouldBe ((3L, 3L, "p q r"))
    out(9L)._2 shouldBe 2L
    out(9L)._3 shouldBe "start finish"
  }

  it should "reject k < 2" in {
    an[IllegalArgumentException] should be thrownBy rewrite(1, 1L -> "a b")
  }

  it should "keep null text NULL and separate from empty text" in {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val docs = Seq((1L, null: String), (2L, null: String), (3L, ""), (4L, ""))
      .toDF("doc_id", "text")
    val out = graft.util.CacheBin.withScope {
      SpanDedup.rewrite(docs, "doc_id", "text", 3).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) null else r.getString(3)))).toMap
    }
    // null-text docs never dedup (no windows) and stay NULL in the output
    out(1L) shouldBe ((0L, 0L, null))
    out(2L) shouldBe ((0L, 0L, null))
    // empty-text docs DO dedup against each other (whole-text fallback
    // window ""), independent of the null-text docs
    out(3L)._3 shouldBe ""
    out(4L) shouldBe ((1L, 0L, ""))
  }

  // ---- byte-span variant ----

  private def rewriteBytes(l: Int, docs: (Long, String)*): Map[Long, (Long, Long, String)] = {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    graft.util.CacheBin.withScope {
      SpanDedup.rewriteBytes(docs.toDF("doc_id", "text"), "doc_id", "text", l)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) null else r.getString(3))))
        .toMap
    }
  }

  behavior of "SpanDedup.rewriteBytes"

  it should "catch a word-boundary-crossing duplicate the word form misses" in {
    // the shared content "aaa bbb ccc" is only THREE words — the word
    // 4-gram form sees no duplicated window, but the 13-char common
    // region " aaa bbb ccc " contains three full 11-byte windows
    val a = 1L -> "xx yy aaa bbb ccc zz ww"
    val b = 2L -> "qq aaa bbb ccc rr ss tt"
    val wordOut = rewrite(4, a, b)
    wordOut(1L) shouldBe ((7L, 7L, "xx yy aaa bbb ccc zz ww")) // untouched
    wordOut(2L) shouldBe ((7L, 7L, "qq aaa bbb ccc rr ss tt")) // MISSED
    val byteOut = rewriteBytes(11, a, b)
    byteOut(1L) shouldBe ((23L, 23L, "xx yy aaa bbb ccc zz ww")) // canonical
    // doc 2's windows at chars 2,3,4 duplicate doc 1's; merged coverage is
    // chars 2..14, so the span (and its flanking spaces) is cut out
    byteOut(2L) shouldBe ((23L, 10L, "qqrr ss tt"))
  }

  it should "remove a within-doc byte-level repeat, keeping the earlier occurrence" in {
    val out = rewriteBytes(5, 3L -> "abcdefg xx abcdefg")
    // norm = "abcdefg xx abcdefg" (18 chars): the second "abcdefg" starts
    // at char 11; its 5-byte windows at 11,12,13 duplicate those at
    // 0,1,2, so merged coverage is chars 11..17 — the earlier occurrence
    // and the separator survive verbatim
    out(3L) shouldBe ((18L, 11L, "abcdefg xx "))
  }

  it should "dedup whole short documents via the whole-text fallback window" in {
    val out = rewriteBytes(50,
      4L -> "tiny pair",
      5L -> "tiny pair",
      6L -> "other words")
    out(4L) shouldBe ((9L, 9L, "tiny pair"))
    out(5L) shouldBe ((9L, 0L, ""))
    out(6L) shouldBe ((11L, 11L, "other words"))
  }

  it should "keep null text NULL and dedup empty docs separately (byte form)" in {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val docs = Seq((1L, null: String), (2L, ""), (3L, ""))
      .toDF("doc_id", "text")
    val out = graft.util.CacheBin.withScope {
      SpanDedup.rewriteBytes(docs, "doc_id", "text", 50).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) null else r.getString(3)))).toMap
    }
    out(1L) shouldBe ((0L, 0L, null))
    out(2L) shouldBe ((0L, 0L, "")) // canonical empty doc
    out(3L) shouldBe ((0L, 0L, ""))
  }

  it should "reject L < 2" in {
    an[IllegalArgumentException] should be thrownBy rewriteBytes(1, 1L -> "a b")
  }
}
