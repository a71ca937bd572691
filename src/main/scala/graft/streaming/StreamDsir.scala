package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming DSIR scoring — the ingest half of
  * [[graft.queries.CorpusQueries.dsirWeights]], deployed the way DSIR is
  * actually used: the hashed-bigram weight table is TRAINED OFFLINE
  * (batch, [[graft.queries.CorpusQueries.dsirBucketWeights]]) and pinned
  * as a parameter — the same pinned-training-artifact discipline as
  * StreamCusum's (k, h) — and every arriving document is scored against
  * it so an ingest pipeline can route/sample by domain fit immediately.
  *
  * The scorer is ONE stateless narrow map: normalize → bigram shingles →
  * poly-hash → bucket → weight lookup in the broadcast literal array →
  * integer mean, all inside `transform`/`aggregate` higher-order
  * functions over the shingle array — no explode, no shuffle, no state.
  * Per-doc output (doc_id, lang, n_bigrams, imp_ppm) is bit-equal to the
  * batch scorer fed the same weights (StreamDsirSpec): instance sums are
  * integer, so neither fold order nor micro-batching can perturb them.
  */
object StreamDsir {

  /** Score one batch/micro-batch of documents against a pinned weight
    * table (dense array, bucket index → ppm weight). Stateless — usable
    * directly on a batch frame or from [[frontDoor]]. */
  def score(batch: DataFrame, idCol: String, langCol: String,
      textCol: String, weights: Array[Long]): DataFrame = {
    val wlit = typedlit(weights.toSeq)
    val words = call_function("graft_words", col(textCol))
    val bgs = graft.ops.NearDup.shinglesOf(words, concat_ws(" ", words), 2)
    def bucketW(bg: Column): Column = element_at(wlit,
      (call_function("graft_poly_hash", bg, lit(31L), lit(1000000007L))
        % weights.length + 1).cast("int"))
    batch
      .select(col(idCol).as("doc_id"), col(langCol).as("lang"),
        bgs.as("bgs"))
      .filter(col("bgs").isNotNull)
      .select(col("doc_id"), col("lang"),
        size(col("bgs")).cast("long").as("n_bigrams"),
        aggregate(transform(col("bgs"), bucketW(_)), lit(0L), (a, x) => a + x)
          .as("wsum"))
      .select(col("doc_id"), col("lang"), col("n_bigrams"),
        expr("wsum div n_bigrams").as("imp_ppm"))
  }

  /** The scorer as a ready writeStream: each micro-batch's scored rows are
    * handed to `emit`. */
  def frontDoor(stream: DataFrame, idCol: String, langCol: String,
      textCol: String, weights: Array[Long])(
      emit: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (b: DataFrame, id: java.lang.Long) =>
      emit(score(b, idCol, langCol, textCol, weights), id)
    }
}
