package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental ingestion dedup — the continuous-crawl pattern: classify
  * each document of a NEW snapshot against the EXISTING corpus plus the
  * new batch itself, without ever re-pairing the existing corpus against
  * itself.
  *
  * Classification, in precedence order (first match wins; every new doc
  * gets exactly one row):
  *   - `exact_dup_old`  — normalized fingerprint already in the corpus
  *                        (partner = smallest matching old id);
  *   - `exact_dup_new`  — fingerprint duplicated inside the batch and this
  *                        is not the batch-canonical (smallest-id) copy;
  *   - `near_dup`       — MinHash-LSH candidate against an old doc or a
  *                        smaller batch-canonical doc verified at
  *                        Jaccard ≥ num/den (partner = smallest qualifying);
  *   - `keep`           — none of the above (partner = -1).
  *
  * Scale shape (the property that makes ingestion OPEN-ENDED at 100 TB):
  * the exact pass is one fingerprint groupBy; the near-dup candidate join
  * is PROBE (new canonicals' band keys) × INDEX (corpus + batch band
  * keys) — an equi-join whose output is bounded by the new batch's
  * duplication, never the corpus's self-pair count. In a deployed pipeline
  * the index side (band keys + shingle-hash sets of the accepted corpus)
  * is a stored table appended per snapshot, so each ingestion touches the
  * corpus once for the join and never recomputes its signatures — the
  * batch form here recomputes them only because the oracle needs a
  * self-contained query. The streaming twin of this discipline is
  * [[graft.streaming.StreamNearDup]]'s cross-micro-batch band-key state.
  */
object IncrDedup {

  /** Classify `docs` (flagged old/new by `isNewCol`) as above. Output:
    * (idCol, status, partner) — one row per NEW doc. */
  def classify(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      isNewCol: String,
      jaccNum: Long,
      jaccDen: Long,
      p: NearDup.Params = NearDup.Params()): DataFrame = {
    val fp = graft.util.CacheBin.persist(docs.select(
      col(idCol).as("id"),
      md5(NearDup.normFused(col(textCol))).as("fp"),
      col(isNewCol).as("is_new")))

    // exact tier
    val oldMin = fp.filter(!col("is_new"))
      .groupBy("fp").agg(min(col("id")).as("old_id"))
    val newDocs = fp.filter(col("is_new"))
    val exactOld = newDocs.join(oldMin, "fp")
      .select(col("id"), lit("exact_dup_old").as("status"),
        col("old_id").as("partner"))
    val newRest = graft.util.CacheBin.persist(
      newDocs.join(oldMin, Seq("fp"), "left_anti"))
    val newCanon = newRest.groupBy("fp").agg(min(col("id")).as("canon"))
    val withCanon = newRest.join(newCanon, "fp")
    val exactNew = withCanon.filter(col("id") =!= col("canon"))
      .select(col("id"), lit("exact_dup_new").as("status"),
        col("canon").as("partner"))
    val probeIds = withCanon.filter(col("id") === col("canon"))
      .select(col("id").as("doc_id"))

    // near-dup tier: probe bands × index bands, one (band, key) equi-join
    val hs = graft.util.CacheBin.persist(
      NearDup.shingleHashes(docs, idCol, textCol, p))
    val bands = graft.util.CacheBin.persist(
      NearDup.bandKeys(NearDup.signatures(hs, p), p))
    val indexIds = fp.filter(!col("is_new"))
      .select(col("id").as("doc_id"), lit(true).as("is_old"))
      .unionAll(probeIds.select(col("doc_id"), lit(false).as("is_old")))
    val probeBands = bands.join(probeIds, "doc_id")
      .select(col("doc_id").as("doc_a"), col("band"), col("k"))
    val indexBands = bands.join(indexIds, "doc_id")
      .select(col("doc_id").as("doc_b"), col("is_old"),
        col("band").as("band2"), col("k").as("k2"))
    val cand = probeBands.join(indexBands,
        col("band") === col("band2") && col("k") === col("k2") &&
          (col("is_old") || col("doc_b") < col("doc_a")))
      .select("doc_a", "doc_b").distinct()
    val ha = hs.select(col("doc_id").as("da"),
      sort_array(col("hs")).as("hs_a"), size(col("hs")).cast("long").as("n_a"))
    val hb = hs.select(col("doc_id").as("db"),
      sort_array(col("hs")).as("hs_b"), size(col("hs")).cast("long").as("n_b"))
    val near = cand
      .join(ha, col("doc_a") === col("da"))
      .join(hb, col("doc_b") === col("db"))
      .select(col("doc_a"), col("doc_b"),
        call_function("graft_intersect_size", col("hs_a"), col("hs_b"))
          .as("inter_cnt"),
        (col("n_a") + col("n_b")).as("nab"))
      .filter(col("inter_cnt") * jaccDen >=
        (col("nab") - col("inter_cnt")) * jaccNum)
      .groupBy(col("doc_a").as("id"))
      .agg(min(col("doc_b")).as("partner"))
      .select(col("id"), lit("near_dup").as("status"), col("partner"))

    val classified = exactOld.unionAll(exactNew).unionAll(near)
    val keep = newDocs.select(col("id"))
      .join(classified.select(col("id").as("cid")),
        col("id") === col("cid"), "left_anti")
      .select(col("id"), lit("keep").as("status"), lit(-1L).as("partner"))
    classified.unionAll(keep).withColumnRenamed("id", idCol)
  }
}
