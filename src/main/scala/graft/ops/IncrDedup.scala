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
  *
  * Round-19 job-count shape (VERDICT r18 #1 — warm stages summed ~1.5 s
  * but the operator measured ~3 s: the residual was orchestration):
  *   - ONE broadcast of the batch-sized classification `marks` frame
  *     serves probe selection, index exclusion and the probe flag —
  *     Spark's ReuseExchange collapses the two identical broadcast
  *     children into a single build;
  *   - the verify tier broadcasts ONLY the pair-id frame into each
  *     hash-set lookup and joins the two candidate-sized lookups to each
  *     other, so no broadcast ever carries shingle-hash arrays (a large
  *     ingest batch of long documents previously risked Spark's 8 GB
  *     broadcast cap) and the corpus-sized set frame is still scanned,
  *     never shuffled;
  *   - the output is a single pass over the cached batch-sized `joined`
  *     frame with the near tier broadcast back onto it — replacing the
  *     union + anti-join + second persist of the r18 form.
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

    // ONE batch-sized marks frame: is_probe = survives both exact tiers.
    // Broadcast twice below with an IDENTICAL child plan so ReuseExchange
    // builds it once; new docs that are neither probe nor excluded don't
    // exist (the exact tiers partition the batch).
    val marks = joined.select(col("id").as("doc_id"),
      (col("old_id").isNull && col("id") === col("new_min")).as("is_probe"))

    // near-dup tier: probe bands × index bands, one (band, key) equi-join.
    // EVERY join below is broadcast-driven from the NEW-BATCH-bounded side
    // (marks, probe bands, candidate pairs) — the corpus-sized frames
    // (bands, hs) are scanned but never shuffled, which is both the 100 TB
    // shape (an ingest batch is bounded by definition; the corpus is not)
    // and the sf0.1 constant-factor win.
    val hs = base.select(col("id").as("doc_id"), col("hs"))
    val bands = graft.util.CacheBin.persist(
      NearDup.bandKeys(NearDup.signatures(hs, p), p))
    val probeBands = bands.join(broadcast(marks), Seq("doc_id"))
      .filter(col("is_probe"))
      .select(col("doc_id").as("doc_a"), col("band"), col("k"))
    // index = old docs (no marks row) + probes; exact-classified new docs
    // (is_probe = false) are excluded — they already have a partner
    val indexBands = bands.join(broadcast(marks), Seq("doc_id"), "left")
      .filter(col("is_probe").isNull || col("is_probe"))
      .select(col("doc_id").as("doc_b"), col("is_probe").isNull.as("is_old"),
        col("band").as("band2"), col("k").as("k2"))
    val cand = broadcast(probeBands).join(indexBands,
        col("band") === col("band2") && col("k") === col("k2") &&
          (col("is_old") || col("doc_b") < col("doc_a")))
      .select("doc_a", "doc_b").distinct()
    // verify: the base frame's hs is already sorted — no per-side re-sort.
    // Broadcast ONLY the pair-id frame into each hash-set lookup (the two
    // candB children are identical → one broadcast build), then join the
    // two candidate-sized lookups to each other: the shingle-hash arrays
    // never ride a broadcast, so a large batch of long documents can't hit
    // the broadcast cap, and the shuffle this costs is candidate-bounded.
    val candB = broadcast(cand)
    val xa = candB.join(hs, col("doc_a") === col("doc_id"))
      .select(col("doc_a"), col("doc_b"), col("hs").as("hs_a"),
        size(col("hs")).cast("long").as("n_a"))
    val xb = candB.join(hs, col("doc_b") === col("doc_id"))
      .select(col("doc_a").as("a2"), col("doc_b").as("b2"),
        col("hs").as("hs_b"), size(col("hs")).cast("long").as("n_b"))
    val near = xa.join(xb, col("doc_a") === col("a2") && col("doc_b") === col("b2"))
      .select(col("doc_a"), col("doc_b"),
        call_function("graft_intersect_size", col("hs_a"), col("hs_b"))
          .as("inter_cnt"),
        (col("n_a") + col("n_b")).as("nab"))
      .filter(col("inter_cnt") * jaccDen >=
        (col("nab") - col("inter_cnt")) * jaccNum)
      .groupBy(col("doc_a").as("id"))
      .agg(min(col("doc_b")).as("near_partner"))

    // single-pass classification: the cached batch-sized joined frame is
    // the spine for every fingerprinted new doc, with the (tiny) near tier
    // broadcast back onto it — the precedence chain IS the when-chain.
    // Null-fingerprint (null-text) new docs can't join on fp; they are
    // keeps by construction, appended from the cached base frame.
    val resolved = joined.join(broadcast(near), Seq("id"), "left")
      .select(col("id"),
        when(col("old_id").isNotNull, lit("exact_dup_old"))
          .when(col("id") =!= col("new_min"), lit("exact_dup_new"))
          .when(col("near_partner").isNotNull, lit("near_dup"))
          .otherwise(lit("keep")).as("status"),
        coalesce(col("old_id"),
          when(col("id") =!= col("new_min"), col("new_min")),
          col("near_partner"), lit(-1L)).as("partner"))
    val nullFp = base.filter(col("is_new") && col("fp").isNull)
      .select(col("id"), lit("keep").as("status"), lit(-1L).as("partner"))
    resolved.unionAll(nullFp).withColumnRenamed("id", idCol)
  }
}
