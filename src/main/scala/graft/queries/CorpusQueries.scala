package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Q._

/** Corpus-construction queries over `documents`: tf-idf term ranking and
  * deterministic stratified sampling — training-data-pipeline extensions
  * beyond the reference surface (which has no text analytics at all).
  *
  * Determinism: tf-idf uses an integer-scaled idf ((N·10⁶) div df) so scores
  * are exact integers — no cross-engine log() ulp drift; sampling uses the
  * portable polynomial hash (see [[graft.ops.Sampling]]).
  */
object CorpusQueries {

  private val normSql =
    """trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g'))"""
  private def polyHashSql(w: String): String =
    s"list_reduce(list_prepend(0::BIGINT, list_transform(string_split($w,''), c -> ascii(c)::BIGINT)), (a,x) -> (a*31+x) % 1000000007)"

  /** Top-3 terms per document by integer-scaled tf·idf (score desc, term
    * asc). Shape at scale: one narrow explode, two groupBys (term counts are
    * map-side combined), a broadcast of the per-term df table's join — the
    * same inverted-index construction pattern as any search indexer. */
  def tfidf(s: SparkSession, dir: String): DataFrame = {
    val docs = tPar(s, dir, "documents")
    val words = docs.select(col("doc_id"),
      explode(graft.ops.NearDup.wordsOf(graft.ops.NearDup.normCol(col("text")))).as("term"))
    // feeds both the df aggregation and the scoring join
    val tf = graft.util.CacheBin.persist(
      words.groupBy("doc_id", "term").agg(count(lit(1)).as("tf")))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val nd = docs.agg(count(lit(1)).as("nd"))
    val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("term"))
    tf.join(dfreq, "term").crossJoin(broadcast(nd))
      .withColumn("score", col("tf") * expr("(nd * 1000000) div df"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select(col("doc_id"), col("rank"), col("term"), col("tf"), col("df"), col("score"))
      .orderBy("doc_id", "rank")
  }

  val tfidfSql: String =
    s"""WITH n AS (SELECT doc_id, $normSql norm FROM documents),
       |w AS (SELECT doc_id, unnest(string_split(norm, ' ')) term FROM n),
       |tf AS (SELECT doc_id, term, count(*) tf FROM w GROUP BY 1, 2),
       |dfreq AS (SELECT term, count(*) df FROM tf GROUP BY 1),
       |nd AS (SELECT count(*) nd FROM documents),
       |sc AS (SELECT doc_id, term, tf, df, tf * ((nd * 1000000) // df) score
       |       FROM tf JOIN dfreq USING (term), nd),
       |r AS (SELECT doc_id, term, tf, df, score,
       |             row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) rank
       |      FROM sc)
       |SELECT doc_id, CAST(rank AS BIGINT) rank, term,
       |       CAST(tf AS BIGINT) tf, CAST(df AS BIGINT) df, CAST(score AS BIGINT) score
       |FROM r WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin

  /** Deterministic stratified sample of the corpus: per-language keep rates
    * via the portable hash ([[graft.ops.Sampling.stratifiedHash]]) — the
    * reproducible-sampling primitive of a training pipeline (a narrow map;
    * no shuffle, no rand()). */
  def stratifiedSample(s: SparkSession, dir: String): DataFrame = {
    val rates = Map("en" -> 10, "de" -> 25, "es" -> 40, "fr" -> 55, "zh" -> 70)
    graft.ops.Sampling.stratifiedHash(
        tPar(s, dir, "documents"), "lang", "doc_id", rates)
      .select(col("doc_id"), col("lang"), col("sample_bucket"))
      .orderBy("doc_id")
  }

  val stratifiedSampleSql: String = {
    val bucket = s"${polyHashSql("concat(lang, ':', CAST(doc_id AS VARCHAR))")} % 100"
    s"""SELECT doc_id, lang, $bucket sample_bucket
       |FROM documents
       |WHERE $bucket < CASE lang WHEN 'en' THEN 10 WHEN 'de' THEN 25
       |                          WHEN 'es' THEN 40 WHEN 'fr' THEN 55
       |                          WHEN 'zh' THEN 70 ELSE 0 END
       |ORDER BY doc_id""".stripMargin
  }

  val queries: Map[String, QueryFn] = Map(
    "text_tfidf" -> (tfidf _),
    "text_stratified_sample" -> (stratifiedSample _),
  )

  val oracle: Map[String, String] = Map(
    "text_tfidf" -> tfidfSql,
    "text_stratified_sample" -> stratifiedSampleSql,
  )
}
