package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Span-level exact-substring removal (Lee et al. 2021, "Deduplicating
  * Training Data Makes Language Models Better"): rewrite every document
  * dropping the tokens of any word k-gram window whose content appears
  * elsewhere in the corpus, KEEPING the first occurrence — the removal
  * pass that [[graft.queries.TextQueries.sharedNgrams text_shared_ngrams]]
  * (the duplicated-mass *signal*) is seeded from. "First" is the
  * lexicographic (id, position) minimum over all instances of the window
  * content, so exactly one canonical copy of every duplicated span
  * survives — within-doc repeats count as duplicates too, as in the paper.
  *
  * This is the deterministic word-k-gram variant (the paper's suffix-array
  * pass works on 50-BYTE spans): every step is exact integer arithmetic
  * over the portable polynomial hash, so a SQL engine reproduces the
  * rewritten text byte-for-byte. Output text is the rewrite of the
  * NORMALIZED document (lowercase, punctuation stripped — [[NearDup.normCol]]),
  * the form every dedup operator in the engine keys on.
  *
  * Shape at scale: one narrow tokenize pass; window instances are one
  * posexplode (k-gram count = token count); the canonical-instance table
  * is ONE map-side-combined groupBy(window hash) — skew-safe: a window
  * appearing millions of times partially aggregates per partition — and
  * joins back as one equi-join (AQE splits a hot hash). Reconstruction is
  * a pure narrow array filter per doc: no token-level shuffle, the kept
  * text never leaves its partition. O(tokens × redundant-windows-per-doc)
  * worst case inside a row — bounded by doc length, not corpus size.
  */
object SpanDedup {

  /** Rewrite each document with duplicated spans removed. Returns
    * `(idCol, n_tokens, n_kept, kept_text)` for EVERY input document —
    * unaffected docs carry their full normalized text. */
  def rewrite(docs: DataFrame, idCol: String, textCol: String, k: Int,
      base: Long = 31L, p: Long = 1000000007L): DataFrame = {
    require(k >= 2, s"spans of k=$k words: need k >= 2 (k=1 drops every repeated word)")
    // normalized token arrays — ONE native tokenize pass (graft_words).
    // NULL text stays NULL (n_tokens 0, kept_text NULL) instead of leaking
    // through concat_ws as the empty-string document and deduping against
    // genuinely empty docs — the normFused discipline.
    // w backs both the window-instance explode and the final
    // reconstruction join. Measured (r21): persisting it LOSES — the
    // columnar cache build + cached scan of the token-array frame costs
    // more than re-running the narrow codegen tokenize (isolated pair
    // 0.83 s → 1.47 s at sf0.1) — so the second derivation is kept.
    val w = docs.select(col(idCol).as("__id"),
      call_function("graft_words", col(textCol)).as("__words"))
    // window instances with 0-based start positions; docs shorter than k
    // fall back to one whole-text window (the shingle machinery's
    // contract), so short exact-duplicate docs still dedup; null-text docs
    // produce no windows at all
    val win = graft.util.CacheBin.persist(w
      .filter(col("__words").isNotNull)
      .select(col("__id"), posexplode(NearDup.shinglesOf(col("__words"),
        concat_ws(" ", col("__words")), k)).as(Seq("__pos", "__sg")))
      .select(col("__id"), col("__pos"),
        NearDup.polyHash(col("__sg"), base, p).as("__wh")))
    // canonical instance per window content = lexicographic (id, pos) min;
    // an instance is redundant iff the content occurs >= 2 times and this
    // instance is not the canonical one
    val firsts = win.groupBy("__wh").agg(count(lit(1)).as("__cnt"),
      min(struct(col("__id"), col("__pos"))).as("__first"))
    val starts = win.join(firsts, "__wh")
      .filter(col("__cnt") >= 2 && !(col("__first.__id") === col("__id") &&
        col("__first.__pos") === col("__pos")))
      .groupBy("__id").agg(collect_list("__pos").as("__starts"))
    // narrow per-doc reconstruction: token j survives unless some redundant
    // window [s, s+k) covers it
    val st = coalesce(col("__starts"), typedlit(Seq.empty[Int]))
    val kept = filter(col("__words"),
      (_, j) => !exists(st, s => s <= j && j < s + k))
    w.join(starts, Seq("__id"), "left_outer")
      .select(col("__id").as(idCol),
        when(col("__words").isNull, 0L)
          .otherwise(size(col("__words")).cast("long")).as("n_tokens"),
        when(col("__words").isNull, 0L)
          .otherwise(size(kept).cast("long")).as("n_kept"),
        when(col("__words").isNull, lit(null).cast("string"))
          .otherwise(concat_ws(" ", kept)).as("kept_text"))
  }

  /** BYTE-span variant — the paper's actual granularity (Lee et al. run
    * their suffix-array pass on 50-BYTE spans): rewrite each document
    * dropping the characters of any length-`L` window of the NORMALIZED
    * text whose content appears elsewhere in the corpus, keeping the
    * lexicographic (id, position) first occurrence. Over the engine's
    * [a-z0-9 ]-normalized text characters ARE bytes, so this is exact
    * byte-span semantics. Catches duplicates the word-k-gram form misses:
    * a duplicated region spanning fewer than k full shared words (e.g. a
    * shared 3-word phrase inside different sentences) still produces
    * identical byte windows.
    *
    * Same one-groupBy shape as [[rewrite]]; the per-position window hashes
    * come from ONE rolling-hash native expression
    * ([[graft.functions.CharWindowHashes]] — O(len) per row, no window
    * strings materialized), and reconstruction is a narrow per-row char
    * filter. Docs shorter than L fall back to one whole-text window. At
    * the paper's corpus scale the suffix array is the memory-optimal
    * candidate generator; this hash-window form trades ~8 bytes per
    * position for the same dedup decisions in two shuffles. */
  def rewriteBytes(docs: DataFrame, idCol: String, textCol: String, L: Int,
      base: Long = 31L, p: Long = 1000000007L): DataFrame = {
    require(L >= 2, s"byte spans of L=$L: need L >= 2")
    // two consumers, deliberately NOT persisted — same measured tradeoff
    // as [[rewrite]]'s w (cache build of the normalized-text frame costs
    // more than the narrow normFused recompute)
    val w = docs.select(col(idCol).as("__id"),
      NearDup.normFused(col(textCol)).as("__norm"))
    val win = graft.util.CacheBin.persist(w
      .filter(col("__norm").isNotNull)
      .select(col("__id"), posexplode(call_function("graft_char_window_hashes",
        col("__norm"), lit(L), lit(base), lit(p))).as(Seq("__pos", "__wh"))))
    val firsts = win.groupBy("__wh").agg(count(lit(1)).as("__cnt"),
      min(struct(col("__id"), col("__pos"))).as("__first"))
    val starts = win.join(firsts, "__wh")
      .filter(col("__cnt") >= 2 && !(col("__first.__id") === col("__id") &&
        col("__first.__pos") === col("__pos")))
      .groupBy("__id").agg(collect_list("__pos").as("__starts"))
    val st = coalesce(col("__starts"), typedlit(Seq.empty[Int]))
    // char j survives unless some redundant window [s, s+L) covers it;
    // split("") would yield [""] — guard the empty document explicitly
    val chars = when(length(col("__norm")) === 0, typedlit(Seq.empty[String]))
      .otherwise(split(col("__norm"), ""))
    val kept = filter(chars, (_, j) => !exists(st, s => s <= j && j < s + L))
    w.join(starts, Seq("__id"), "left_outer")
      .select(col("__id").as(idCol),
        when(col("__norm").isNull, 0L)
          .otherwise(length(col("__norm")).cast("long")).as("n_chars"),
        when(col("__norm").isNull, 0L)
          .otherwise(size(kept).cast("long")).as("n_kept"),
        when(col("__norm").isNull, lit(null).cast("string"))
          .otherwise(concat_ws("", kept)).as("kept_text"))
  }
}
