package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Eval-set decontamination — parameterized n-gram-overlap screening of a
  * training corpus against benchmark/eval sets (the step every serious
  * pretraining pipeline runs so test data never leaks into training data;
  * beyond the reference surface, which has no text analytics).
  *
  * Scale contract: eval sets are SMALL BY DESIGN, so the distinct eval
  * shingle set is broadcast into the overlap join — the corpus side is
  * scan → narrow normalize/shingle map → explode → broadcast-hash-join →
  * one map-side-combined groupBy(doc). The corpus never shuffles, state is
  * bounded by the eval shingle set, and the plan parallelizes with input
  * splits. `GraftPlanSpec` pins the broadcast; the `text_decontam` oracle
  * pins the arithmetic (exact integer counts).
  */
object Decontam {

  /** Distinct word-k-gram sets: (idCol, sh: array<string>). Narrow map. */
  def shingleSets(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val norm = NearDup.normCol(col(textCol))
    docs.select(col(idCol), norm.as("__norm"))
      .select(col(idCol), NearDup.wordsOf(col("__norm")).as("__words"), col("__norm"))
      .select(col(idCol),
        array_distinct(NearDup.shinglesOf(col("__words"), col("__norm"), k)).as("sh"))
  }

  /** Per-document overlap of `corpus` against `evalDocs`:
    * (id, n_shingles, overlap_cnt, overlap_pct) for contaminated documents
    * only — integer arithmetic, deterministic.
    *
    * Both frames must carry `idCol` and `textCol`. The corpus shingle frame
    * is persisted when `persistShingles` (default): it stops the
    * optimizer's inferred explode filters from re-evaluating the whole
    * normalize + k-gram chain (see SCALE.md "Optimizer hazards"), at the
    * cost of materializing (id, shingles). Callers release it via their
    * [[graft.util.CacheBin]] scope. */
  def overlap(corpus: DataFrame, evalDocs: DataFrame, idCol: String,
      textCol: String, k: Int = 5, persistShingles: Boolean = true): DataFrame = {
    val corpusSh0 = shingleSets(corpus, idCol, textCol, k)
    val corpusSh =
      if (persistShingles) graft.util.CacheBin.persist(corpusSh0) else corpusSh0
    val evalSet = shingleSets(evalDocs, idCol, textCol, k)
      .select(explode(col("sh")).as("__esh")).distinct()
    corpusSh
      .select(col(idCol), size(col("sh")).cast("long").as("n_shingles"),
        explode(col("sh")).as("__csh"))
      .join(broadcast(evalSet), col("__csh") === col("__esh"))
      .groupBy(idCol)
      .agg(first(col("n_shingles")).as("n_shingles"),
        count(lit(1)).as("overlap_cnt"))
      .withColumn("overlap_pct", expr("(overlap_cnt * 100) div n_shingles"))
  }

  /** The screening filter: corpus rows whose overlap percent stays BELOW
    * `maxPct` (contaminated docs dropped; id column preserved). */
  def clean(corpus: DataFrame, evalDocs: DataFrame, idCol: String,
      textCol: String, k: Int = 5, maxPct: Long = 0L): DataFrame = {
    val bad = overlap(corpus, evalDocs, idCol, textCol, k)
      .filter(col("overlap_pct") > maxPct)
      .select(col(idCol).as("__bad_id"))
    corpus.join(bad, corpus(idCol) === col("__bad_id"), "left_anti")
  }
}
