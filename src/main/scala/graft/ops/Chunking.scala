package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-size token chunking with overlap — the standard long-document →
  * training-sequence splitter (each chunk carries `chunkTokens` whitespace
  * tokens of the normalized text; consecutive chunks overlap by
  * `chunkTokens - stride` so no span longer than the overlap is ever cut
  * across a boundary). The complement of [[Packing]] (which bins short
  * docs UP to a sequence length; this splits long docs DOWN to it).
  *
  * Scale shape: entirely per-row — split, `sequence` explode, `slice`,
  * `md5` are all codegen'd higher-order expressions; no shuffle, no state,
  * rows fan out by ~n/stride. Chunk identity is the md5 of the exact token
  * span, so downstream chunk-level dedup (exact or MinHash) composes
  * directly.
  */
object Chunking {

  /** docs(doc_id, text) → (doc_id, chunk_no, n_tokens, chunk_md5).
    * Chunk `i` covers tokens [i·stride, i·stride + chunkTokens); the last
    * chunk is the first one whose span reaches the end of the document
    * (possibly shorter than `chunkTokens`, never empty). */
  /** Like [[chunks]] but emits the chunk's TOKEN SPAN text instead of its
    * md5: (doc_id, chunk_no, n_tokens, span). The rewrite form — a caller
    * that reassembles documents from surviving chunks (passage-level
    * corpus dedup, [[graft.queries.TextQueries]] `text_passage_scrub`)
    * needs the text; the report form keeps the narrower md5 frame. Same
    * chunk geometry, same null-text semantics, same zero-shuffle plan. */
  def spans(docs: DataFrame, chunkTokens: Int = 64,
      stride: Int = 48): DataFrame = {
    require(stride >= 1 && stride <= chunkTokens,
      "stride must be in [1, chunkTokens]")
    val C = chunkTokens
    val S = stride
    docs
      .filter(col("text").isNotNull)
      .select(col("doc_id"),
        split(NearDup.normFused(col("text")), " ").as("words"))
      .withColumn("n", size(col("words")).cast("long"))
      .withColumn("chunk_no",
        explode(sequence(lit(0L),
          expr(s"(greatest(n - $C, 0L) + ${S - 1}) div $S"))))
      .select(col("doc_id"), col("chunk_no"),
        least(lit(C.toLong), col("n") - col("chunk_no") * S).as("n_tokens"),
        array_join(
          slice(col("words"), (col("chunk_no") * S + 1).cast("int"), lit(C)),
          " ").as("span"))
  }

  def chunks(docs: DataFrame, chunkTokens: Int = 64,
      stride: Int = 48): DataFrame = {
    require(stride >= 1 && stride <= chunkTokens,
      "stride must be in [1, chunkTokens]")
    val C = chunkTokens
    val S = stride
    docs
      // null text yields NO chunks (matches SQL semantics, where the NULL
      // propagates into generate_series and the unnest drops the row —
      // without this filter Spark's size(null) = -1 would emit a junk row)
      .filter(col("text").isNotNull)
      .select(col("doc_id"),
        split(NearDup.normFused(col("text")), " ").as("words"))
      .withColumn("n", size(col("words")).cast("long"))
      // last chunk index: ceil(max(n-C, 0) / S) — 0 when the doc fits
      .withColumn("chunk_no",
        explode(sequence(lit(0L),
          expr(s"(greatest(n - $C, 0L) + ${S - 1}) div $S"))))
      .select(col("doc_id"), col("chunk_no"),
        least(lit(C.toLong), col("n") - col("chunk_no") * S).as("n_tokens"),
        md5(array_join(
          slice(col("words"), (col("chunk_no") * S + 1).cast("int"), lit(C)),
          " ")).as("chunk_md5"))
  }
}
