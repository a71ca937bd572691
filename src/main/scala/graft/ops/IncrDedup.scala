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
  *
  * Round-18 cost shape (VERDICT r17 #3 — this was the one real-work query
  * DuckDB beat 4×): ONE persisted base frame carries BOTH the md5
  * fingerprint and the (pre-sorted) shingle-hash set, so the text is
  * scanned and normalized once, not once per tier; the two exact tiers
  * fold into a single fingerprint groupBy (`min(old id)` + `min(new id)`
  * per fp, conditional aggregation) joined back once — replacing the old
  * groupBy → join → anti-join → groupBy → join chain; and the verify join
  * reads the base frame's already-sorted sets directly (IntersectSize
  * merge path) instead of re-sorting per side.
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
    // ONE text pass: normalize once, derive fingerprint AND sorted shingle
    // set from the normalized output (shingle hashing over normFused text
    // is idempotent — no second regex/normalization); sort_array here means
    // every downstream intersection takes the sorted-merge path free
    val base = graft.util.CacheBin.persist(docs
      .select(col(idCol).as("id"),
        NearDup.normFused(col(textCol)).as("norm"),
        col(isNewCol).as("is_new"))
      .select(col("id"), md5(col("norm")).as("fp"),
        sort_array(call_function("graft_shingle_hashes", col("norm"),
          lit(p.shingleK), lit(p.hashBase), lit(p.hashP))).as("hs"),
        col("is_new")))

    // exact tiers, folded into one fingerprint groupBy: the per-fp smallest
    // old id decides exact_dup_old; otherwise the per-fp smallest NEW id is
    // the batch canonical (new_min only matters when old_id is null, so
    // computing it over all new copies is equivalent to the old
    // anti-join-then-group form). Null-fp (null-text) docs fall out of the
    // inner join and land in the keep tier, like the old null-key joins.
    val fpStats = base.groupBy("fp").agg(
      min(when(!col("is_new"), col("id"))).as("old_id"),
      min(when(col("is_new"), col("id"))).as("new_min"))
    val joined = graft.util.CacheBin.persist(
      base.filter(col("is_new")).select("id", "fp").join(fpStats, "fp"))
    val exactOld = joined.filter(col("old_id").isNotNull)
      .select(col("id"), lit("exact_dup_old").as("status"),
        col("old_id").as("partner"))
    val exactNew = joined.filter(col("old_id").isNull && col("id") =!= col("new_min"))
      .select(col("id"), lit("exact_dup_new").as("status"),
        col("new_min").as("partner"))
    val probeIds = joined.filter(col("old_id").isNull && col("id") === col("new_min"))
      .select(col("id").as("doc_id"))

    // near-dup tier: probe bands × index bands, one (band, key) equi-join.
    // EVERY join below is broadcast-driven from the NEW-BATCH-bounded side
    // (probe ids, probe bands, the exact-dup exclusion set, candidate
    // pairs) — the corpus-sized frames (bands, hs) are scanned but never
    // shuffled, which is both the 100 TB shape (an ingest batch is bounded
    // by definition; the corpus is not) and the sf0.1 constant-factor win
    // (the old formulation paid 5 tiny-data exchanges here).
    val hs = base.select(col("id").as("doc_id"), col("hs"))
    val bands = graft.util.CacheBin.persist(
      NearDup.bandKeys(NearDup.signatures(hs, p), p))
    val probeIdsB = broadcast(probeIds)
    val probeBands = bands.join(probeIdsB, "doc_id")
      .select(col("doc_id").as("doc_a"), col("band"), col("k"))
    // index = old docs + probes = everything minus the new docs already
    // classified exact — an exclusion set bounded by the new batch
    val newNonProbe = joined
      .filter(col("old_id").isNotNull || col("id") =!= col("new_min"))
      .select(col("id").as("doc_id"))
    val indexBands = bands
      .join(broadcast(newNonProbe), Seq("doc_id"), "left_anti")
      .join(probeIdsB.withColumn("is_probe", lit(true)), Seq("doc_id"), "left")
      .select(col("doc_id").as("doc_b"),
        coalesce(!col("is_probe"), lit(true)).as("is_old"),
        col("band").as("band2"), col("k").as("k2"))
    val cand = broadcast(probeBands).join(indexBands,
        col("band") === col("band2") && col("k") === col("k2") &&
          (col("is_old") || col("doc_b") < col("doc_a")))
      .select("doc_a", "doc_b").distinct()
    // verify: the base frame's hs is already sorted — no per-side re-sort;
    // the candidate side broadcasts into both hash-set lookups
    val ha = hs.select(col("doc_id").as("da"), col("hs").as("hs_a"),
      size(col("hs")).cast("long").as("n_a"))
    val hb = hs.select(col("doc_id").as("db"), col("hs").as("hs_b"),
      size(col("hs")).cast("long").as("n_b"))
    val near = broadcast(broadcast(cand)
      .join(ha, col("doc_a") === col("da")))
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

    // classified is read TWICE (the output union and keep's anti-join) —
    // without the persist the whole near-tier candidate+verify join runs
    // twice, which profiling showed was most of the operator's cost
    val classified = graft.util.CacheBin.persist(
      exactOld.unionAll(exactNew).unionAll(near))
    val keep = base.filter(col("is_new")).select(col("id"))
      .join(classified.select(col("id").as("cid")),
        col("id") === col("cid"), "left_anti")
      .select(col("id"), lit("keep").as("status"), lit(-1L).as("partner"))
    classified.unionAll(keep).withColumnRenamed("id", idCol)
  }
}
