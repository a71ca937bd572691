package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Q._

/** The composite training-corpus cleaning pipeline — the north-star shape,
  * oracle-checked end to end: quality filter → exact dedup (md5, keep min
  * doc_id) → MinHash-LSH near-dup removal (drop the younger doc of any
  * candidate pair with Jaccard ≥ threshold) → surviving corpus.
  *
  * Every stage is the deterministic machinery proven by its standalone
  * query (text_quality_score, text_dedup_exact, text_minhash_pairs), so the
  * chained result hash-matches DuckDB too. At scale the chain is: narrow
  * maps (normalize/hash) → one groupBy (exact dedup) → one (band,key)
  * shuffle (LSH) → one anti join (drop near-dups) — no quadratic stage.
  */
object PipelineQueries {

  private val JACC_T_NUM = 1L // threshold 1/2 as exact integers
  private val JACC_T_DEN = 2L

  /** Quality-filtered docs with content fingerprints — stage 1 is the
    * shared [[graft.ops.Quality]] signals + canonical keep rule (same
    * thresholds as text_quality_score, defined once). The normalized text
    * is emitted ONCE ([[graft.ops.NearDup.normFused]], a single native
    * tokenize pass — no regex) and feeds both the md5 fingerprint here and
    * the shingle hashing downstream; the filter runs first so dropped rows
    * never pay normalization or md5. */
  private def qualityKept(s: SparkSession, dir: String): DataFrame =
    qualityFingerprints(
      tPar(s, dir, "documents").select(col("doc_id"), col("text"), col("lang")))

  /** Stage 1 on any (doc_id, text, …) frame — ALSO the per-micro-batch
    * stage of [[graft.streaming.CleanCorpusStream]], defined once so the
    * streamed pipeline provably applies the identical keep rule. */
  private[graft] def qualityFingerprints(docs: DataFrame): DataFrame =
    graft.ops.Quality.withSignals(docs)
      .filter(graft.ops.Quality.keepFlag)
      .withColumn("norm", graft.ops.NearDup.normFused(col("text")))
      .withColumn("fp", md5(col("norm")))

  /** Clean-corpus survivors with per-stage accounting.
    *
    * Stage 3 reads the MEMOIZED full-corpus near-dup pair artifact
    * ([[TextQueries.nearDupPairs]] — the (doc_a, doc_b, inter, union)
    * table a production pipeline materializes once per corpus snapshot;
    * the same artifact text_minhash_pairs / text_dup_clusters /
    * pipe_split_* consume, declared in Bench's `memoized` field) and
    * restricts it to the stage-1/2 survivors, instead of re-running the
    * shingle-hash → signature → band-join → Jaccard pipeline per
    * execution over the survivor set (round 22; the rebuild was ~60% of
    * the query's isolated time). Equivalence (the argument the DuckDB
    * oracle itself encodes — its `dropb` CTE intersects FULL-corpus pairs
    * with the exact-survivor set): band collisions and Jaccard are
    * per-document/per-pair properties, so pairs-over-survivors ==
    * full-corpus pairs with both ends surviving; shingle hashing is
    * normalization-idempotent, so hashing the raw text (artifact) and the
    * pre-normalized text (old in-query build) yields identical hash sets.
    * The doc_a end is restricted by an explicit semi-join below; the
    * doc_b end needs no restriction at all — the final anti-join only
    * ever removes ids that ARE survivors.
    *
    * This also lets stage 2 drop the text BEFORE its shuffle: the dedup
    * window now moves (doc_id, lang, fp) only — at 100 TB the heavy
    * payload column never enters an exchange (guide §2.3 "project before
    * the exchange", §8's lightweight-proxy rule). */
  def cleanCorpus(s: SparkSession, dir: String): DataFrame = {
    // single-use: the window dedup below is its only consumer
    val quality = qualityKept(s, dir)

    // stage 2: exact dedup — canonical = min doc_id per content hash.
    // A keyed min-window + filter keeps the canonical ROW in one shuffle on
    // fp; the groupBy-then-join-back shape costs that same shuffle PLUS a
    // join of the full quality set against the survivor ids.
    val wFp = org.apache.spark.sql.expressions.Window.partitionBy("fp")
    // survivorDocs feeds the drop-set semi-join AND the anti-join keep
    // side — persist (tiny: two narrow columns, no text) or the quality
    // scan + dedup window replay per consumer
    val survivorDocs = graft.util.CacheBin.persist(
      quality.select(col("doc_id"), col("lang"), col("fp"))
        .withColumn("min_id", min("doc_id").over(wFp))
        .filter(col("doc_id") === col("min_id"))
        .select(col("doc_id"), col("lang")))
    // stage 3: near-dup removal among exact survivors (keep-min-id
    // policy) off the shared pair artifact
    val near = TextQueries.nearDupPairs(s, dir)
      .filter(col("inter_cnt") * JACC_T_DEN >= col("union_cnt") * JACC_T_NUM)
      .select(col("doc_a"), col("doc_b"))
    val drop = near
      .join(survivorDocs.select(col("doc_id").as("sid")),
        col("doc_a") === col("sid"), "left_semi")
      .select(col("doc_b").as("drop_id")).distinct()
    survivorDocs.join(drop, col("doc_id") === col("drop_id"), "left_anti")
      .groupBy("lang")
      .agg(count(lit(1)).as("kept_docs"), min("doc_id").as("first_doc"),
        max("doc_id").as("last_doc"))
      .orderBy("lang")
  }

  val cleanCorpusSql: String = {
    // reuse the proven SQL stages as CTEs
    val normSql =
      """trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g'))"""
    s"""WITH q AS (
       |  SELECT doc_id, lang, md5($normSql) fp FROM (
       |    SELECT doc_id, lang, text,
       |           CAST(len(string_split($normSql, ' ')) AS BIGINT) n_words,
       |           CAST(len(list_filter(string_split($normSql, ' '),
       |                w -> w IN ('the','and','of','to','in','a','is','for','on','with'))) AS BIGINT) stop_cnt,
       |           CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS BIGINT) n_punct,
       |           CAST(length(text) AS BIGINT) n_chars_t
       |    FROM documents)
       |  WHERE n_words >= 20 AND stop_cnt*100 >= n_words*2 AND n_punct*100 <= n_chars_t*10),
       |exact AS (SELECT min(doc_id) doc_id FROM q GROUP BY fp),
       |mp AS (${TextQueries.minhashPairsSql.replace("ORDER BY doc_a, doc_b", "")}),
       |near AS (SELECT doc_a, doc_b FROM mp WHERE jaccard * $JACC_T_DEN >= $JACC_T_NUM),
       |dropb AS (SELECT DISTINCT n.doc_b drop_id FROM near n
       |          JOIN exact a ON n.doc_a = a.doc_id
       |          JOIN exact b ON n.doc_b = b.doc_id),
       |cleaned AS (SELECT doc_id FROM exact
       |            WHERE doc_id NOT IN (SELECT drop_id FROM dropb))
       |SELECT q.lang, count(*) kept_docs, min(c.doc_id) first_doc, max(c.doc_id) last_doc
       |FROM cleaned c JOIN q ON c.doc_id = q.doc_id
       |GROUP BY q.lang ORDER BY q.lang""".stripMargin
  }

  /** Deterministic output sharding — the final stage of a training-data
    * pipeline: every document lands in a reproducible shard
    * (portable_hash(doc_id) mod n), so re-runs, retries and different
    * engines produce byte-identical shard assignments; within-shard order
    * is the hash (a deterministic pseudo-random permutation, which is what
    * training wants — no coordinated global shuffle step). The report is
    * per-shard counts + token mass + hash range. One narrow map + one
    * map-side-combined groupBy; writing is `partitionBy(shard)` on top. */
  def shardPlan(s: SparkSession, dir: String): DataFrame = {
    val N_SHARDS = 16
    val words = graft.ops.NearDup.wordsOf(graft.ops.NearDup.normFused(col("text")))
    tPar(s, dir, "documents")
      .select(col("doc_id"), size(words).cast("long").as("n_words"),
        graft.ops.NearDup.polyHash(concat(lit("shard:"), col("doc_id").cast("string")),
          31L, 1000000007L).as("h"))
      .withColumn("shard", col("h") % N_SHARDS)
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum("n_words").as("n_tokens"),
        min("h").as("min_h"), max("h").as("max_h"))
      .orderBy("shard")
  }

  val shardPlanSql: String = {
    val normSql =
      """trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g'))"""
    val hashSql =
      "list_reduce(list_prepend(0::BIGINT, list_transform(string_split(concat('shard:', CAST(doc_id AS VARCHAR)),''), c -> ascii(c)::BIGINT)), (a,x) -> (a*31+x) % 1000000007)"
    s"""WITH d AS (SELECT doc_id,
       |                  CAST(len(string_split($normSql, ' ')) AS BIGINT) n_words,
       |                  $hashSql h
       |           FROM documents)
       |SELECT h % 16 shard, CAST(count(*) AS BIGINT) n_docs,
       |       CAST(sum(n_words) AS BIGINT) n_tokens,
       |       min(h) min_h, max(h) max_h
       |FROM d GROUP BY 1 ORDER BY shard""".stripMargin
  }

  /** Sequence packing plan — group documents into fixed token-budget
    * training sequences: documents in deterministic doc_id order, running
    * token cumsum, sequence = (cumsum - n_words) div budget (each doc
    * joins the sequence its first token falls in). The cumsum is the
    * DISTRIBUTED two-pass prefix sum ([[graft.ops.Packing.runningSum]]) —
    * never the single-partition global window — then one groupBy for the
    * per-sequence report; the cumsum-binning approximation of greedy
    * packing, reproducible on any engine/partitioning (the oracle mirrors
    * it with a plain window cumsum: identical values). */
  def packSequences(s: SparkSession, dir: String): DataFrame = {
    val BUDGET = 2048L
    val words = graft.ops.NearDup.wordsOf(graft.ops.NearDup.normFused(col("text")))
    val counted = tPar(s, dir, "documents")
      .select(col("doc_id"), size(words).cast("long").as("n_words"))
    graft.ops.Packing.runningSum(counted, "doc_id", "n_words")
      .withColumn("seq_id", expr(s"(cum - n_words) div $BUDGET"))
      .groupBy("seq_id")
      .agg(count(lit(1)).as("n_docs"), sum("n_words").as("n_tokens"),
        min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
      .orderBy("seq_id")
  }

  val packSequencesSql: String = {
    val normSql =
      """trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g'))"""
    s"""WITH d AS (SELECT doc_id,
       |                  CAST(len(string_split($normSql, ' ')) AS BIGINT) n_words
       |           FROM documents),
       |c AS (SELECT doc_id, n_words,
       |             CAST(sum(n_words) OVER (ORDER BY doc_id
       |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) cum
       |      FROM d)
       |SELECT (cum - n_words) // 2048 seq_id, CAST(count(*) AS BIGINT) n_docs,
       |       CAST(sum(n_words) AS BIGINT) n_tokens,
       |       min(doc_id) first_doc, max(doc_id) last_doc
       |FROM c GROUP BY 1 ORDER BY seq_id""".stripMargin
  }

  /** Z-order layout report — the data-layout stage of a 100 TB pipeline:
    * interleave `(l_partkey, l_suppkey)` into a Morton z-value
    * ([[graft.ops.ZOrder]]) and report, per fixed-grid z-cell (`z >> 16`,
    * i.e. all but the low 8 bits of each key fixed), the row count and the
    * per-key bounding box. The box spans are the point: every cell's span
    * is ≤ 255 in BOTH keys (the z-curve grid-cell bound), which is exactly
    * why a z-ordered write prunes on either column from min/max file
    * statistics — the report is the evidence a table-optimizer would emit
    * after `OPTIMIZE ZORDER BY`.
    *
    * Scale shape: the z-value is a static codegen'd narrow map; the report
    * is ONE map-side-combined groupBy over ≤ #cells groups. The cluster
    * write path is `repartitionByRange` on the z-value + partitioned write;
    * this report is its oracle-checkable twin. */
  def zorderLayout(s: SparkSession, dir: String): DataFrame = {
    val BITS = 21
    val SHIFT = 16
    tPar(s, dir, "lineitem")
      .select(col("l_partkey").cast("long").as("pk"),
        col("l_suppkey").cast("long").as("sk"))
      .withColumn("cell",
        shiftright(graft.ops.ZOrder.zvalue(col("pk"), col("sk"), BITS), SHIFT))
      .groupBy("cell")
      .agg(count(lit(1)).as("n_rows"),
        min("pk").as("min_pk"), max("pk").as("max_pk"),
        min("sk").as("min_sk"), max("sk").as("max_sk"))
      .select(col("cell"), col("n_rows"),
        col("min_pk"), col("max_pk"), col("min_sk"), col("max_sk"),
        (col("max_pk") - col("min_pk")).as("pk_span"),
        (col("max_sk") - col("min_sk")).as("sk_span"))
      .orderBy("cell")
  }

  val zorderLayoutSql: String = {
    val zSql = graft.ops.ZOrder.zvalueSql("l_partkey", "l_suppkey", 21)
    s"""WITH z AS (SELECT l_partkey pk, l_suppkey sk, $zSql z FROM lineitem)
       |SELECT z >> 16 cell, CAST(count(*) AS BIGINT) n_rows,
       |       min(pk) min_pk, max(pk) max_pk, min(sk) min_sk, max(sk) max_sk,
       |       max(pk) - min(pk) pk_span, max(sk) - min(sk) sk_span
       |FROM z GROUP BY 1 ORDER BY cell""".stripMargin
  }

  /** Shuffle-skew audit — the pre-flight diagnostic every 100 TB
    * groupBy/join needs: for the hottest keys of a shuffle column, report
    * exact share and the salt factor that would level them. Per top-10 key
    * (count desc, key asc): count, corpus share in ppm, skew multiple in
    * ppm (count · distinct-keys / total — 1 000 000 = perfectly level),
    * and `salt_rec` = ⌈count · P / total⌉ for P=32 — the number of salt
    * buckets that caps the key's per-bucket share at one partition's fair
    * share (1 = no salting needed). All integer arithmetic, engine-exact.
    *
    * Scale shape: ONE map-side-combined groupBy over the key domain, a
    * bounded global top-k (TakeOrderedAndProject — never a full sort), and
    * the totals row joined in as a broadcast single-row aggregate. Driver
    * state: 10 rows. */
  def skewAudit(s: SparkSession, dir: String): DataFrame = {
    val P = 32
    // counts backs both the totals aggregate and the top-10; measured
    // (r21), persisting it LOSES (isolated pair 0.13 s → 0.37 s at
    // sf0.1 — the cache materialization stage dwarfs the map-side-combined
    // re-aggregate) — left as-is
    val counts = events(s, dir)
      .groupBy("user_id").agg(count(lit(1)).as("cnt"))
    val totals = counts.agg(sum("cnt").as("total"),
      count(lit(1)).as("n_keys"))
    val top = counts.orderBy(col("cnt").desc, col("user_id")).limit(10)
    // rank over the already-bounded 10-row top: the unpartitioned window
    // sees 10 rows by construction (same category as the broadcast 1-row
    // totals), never the key domain
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt").desc, col("user_id"))
    top.crossJoin(broadcast(totals))
      .withColumn("rank", row_number().over(w).cast("long"))
      .select(col("rank"), col("user_id"), col("cnt"),
        expr("cnt * 1000000 div total").as("share_ppm"),
        expr("cnt * n_keys * 1000000 div total").as("skew_x_ppm"),
        expr(s"(cnt * $P + total - 1) div total").as("salt_rec"))
      .orderBy("rank")
  }

  val skewAuditSql: String =
    """WITH c AS (SELECT user_id, count(*) cnt FROM events GROUP BY 1),
      |t AS (SELECT CAST(sum(cnt) AS BIGINT) total, count(*) n_keys FROM c),
      |r AS (SELECT user_id, cnt,
      |             row_number() OVER (ORDER BY cnt DESC, user_id) rank
      |      FROM c)
      |SELECT CAST(r.rank AS BIGINT) rank, r.user_id, CAST(r.cnt AS BIGINT) cnt,
      |       (r.cnt * 1000000) // t.total share_ppm,
      |       (r.cnt * t.n_keys * 1000000) // t.total skew_x_ppm,
      |       (r.cnt * 32 + t.total - 1) // t.total salt_rec
      |FROM r, t WHERE r.rank <= 10 ORDER BY rank""".stripMargin

  /** Data-quality gate — the Deequ-style validation report
    * ([[graft.ops.Expectations]]) a pipeline runs before publishing:
    * seven declarative rules over `lineitem` (null checks, composite-key
    * uniqueness, value ranges, accepted enums), each an exact violation
    * count. The whole report is ONE job: one shared scan, one
    * map-side-combined aggregate row, melted to per-check rows by a
    * constant projection — never a pass per rule, never a join. */
  def dataQuality(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Expectations._
    report(tPar(s, dir, "lineitem"), Seq(
      notNull("l_orderkey"),
      notNull("l_shipdate"),
      unique("order_line", col("l_orderkey") * 8 + col("l_linenumber")),
      inRange("l_quantity", lit(1.0), lit(50.0)),
      inRange("l_discount", lit(0.0), lit(0.1)),
      satisfies("positive_price",
        col("l_extendedprice").isNotNull && col("l_extendedprice") <= 0),
      acceptedValues("l_returnflag", Seq("R", "A", "N"))))
  }

  val dataQualitySql: String =
    """WITH a AS (
      |  SELECT count(*) n_rows,
      |    CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) c1,
      |    CAST(sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) c2,
      |    CAST(count(l_orderkey * 8 + l_linenumber)
      |         - count(DISTINCT l_orderkey * 8 + l_linenumber) AS BIGINT) c3,
      |    CAST(sum(CASE WHEN l_quantity IS NOT NULL AND (l_quantity < 1.0 OR l_quantity > 50.0) THEN 1 ELSE 0 END) AS BIGINT) c4,
      |    CAST(sum(CASE WHEN l_discount IS NOT NULL AND (l_discount < 0.0 OR l_discount > 0.1) THEN 1 ELSE 0 END) AS BIGINT) c5,
      |    CAST(sum(CASE WHEN l_extendedprice IS NOT NULL AND l_extendedprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) c6,
      |    CAST(sum(CASE WHEN l_returnflag IS NOT NULL AND l_returnflag NOT IN ('R','A','N') THEN 1 ELSE 0 END) AS BIGINT) c7
      |  FROM lineitem)
      |SELECT * FROM (
      |  SELECT 'not_null:l_orderkey' "check", n_rows, c1 n_violations, c1 = 0 pass FROM a
      |  UNION ALL SELECT 'not_null:l_shipdate', n_rows, c2, c2 = 0 FROM a
      |  UNION ALL SELECT 'unique:order_line', n_rows, c3, c3 = 0 FROM a
      |  UNION ALL SELECT 'in_range:l_quantity', n_rows, c4, c4 = 0 FROM a
      |  UNION ALL SELECT 'in_range:l_discount', n_rows, c5, c5 = 0 FROM a
      |  UNION ALL SELECT 'satisfies:positive_price', n_rows, c6, c6 = 0 FROM a
      |  UNION ALL SELECT 'accepted_values:l_returnflag', n_rows, c7, c7 = 0 FROM a
      |) ORDER BY "check"""".stripMargin

  /** Per-SOURCE data-quality gate over the documents corpus — the
    * partitioned-publish variant of [[dataQuality]]: each ingest source
    * gets its own pass/fail per rule, so a single bad feed is isolated
    * instead of drowning in the global counts. One map-side-combined
    * groupBy(source) job ([[graft.ops.Expectations.reportBy]]). */
  def qualityBySource(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Expectations._
    reportBy(tPar(s, dir, "documents"), Seq("source"), Seq(
      notNull("text"),
      unique("doc", col("doc_id")),
      inRange("n_chars", lit(60L), lit(600L)),
      acceptedValues("lang", Seq("en", "de", "es"))))
  }

  val qualityBySourceSql: String =
    """WITH a AS (
      |  SELECT source, count(*) n_rows,
      |    CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT) c1,
      |    CAST(count(doc_id) - count(DISTINCT doc_id) AS BIGINT) c2,
      |    CAST(sum(CASE WHEN n_chars IS NOT NULL AND (n_chars < 60 OR n_chars > 600) THEN 1 ELSE 0 END) AS BIGINT) c3,
      |    CAST(sum(CASE WHEN lang IS NOT NULL AND lang NOT IN ('en','de','es') THEN 1 ELSE 0 END) AS BIGINT) c4
      |  FROM documents GROUP BY source)
      |SELECT * FROM (
      |  SELECT source, 'not_null:text' "check", n_rows, c1 n_violations, c1 = 0 pass FROM a
      |  UNION ALL SELECT source, 'unique:doc', n_rows, c2, c2 = 0 FROM a
      |  UNION ALL SELECT source, 'in_range:n_chars', n_rows, c3, c3 = 0 FROM a
      |  UNION ALL SELECT source, 'accepted_values:lang', n_rows, c4, c4 = 0 FROM a
      |) ORDER BY source, "check"""".stripMargin

  /** Deterministic train/val/test split assignment
    * ([[graft.ops.SplitAssign]]): split = f(md5(doc_id)) with 90/5/5
    * bucket thresholds — stable under reruns, appends and repartitioning
    * (no rand(), no row numbering), and recomputable by any engine for
    * audit (the oracle re-derives every assignment from scratch). Rolled up
    * per (split, lang) so the dump stays small while pinning each doc's
    * assignment through the counts and char sums. */
  def splitAssign(s: SparkSession, dir: String): DataFrame =
    graft.ops.SplitAssign.withSplit(
        t(s, dir, "documents"), "doc_id")
      .groupBy("split", "lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"))
      .orderBy("split", "lang")

  val splitAssignSql: String =
    """WITH m AS (SELECT lang, n_chars, md5(CAST(doc_id AS VARCHAR)) h FROM documents),
      |b AS (SELECT lang, n_chars,
      |        ((strpos('0123456789abcdef', h[1:1]) - 1) * 16
      |         + (strpos('0123456789abcdef', h[2:2]) - 1)) * 256
      |        + ((strpos('0123456789abcdef', h[3:3]) - 1) * 16
      |           + (strpos('0123456789abcdef', h[4:4]) - 1)) bucket
      |      FROM m),
      |s AS (SELECT CASE WHEN bucket < 58982 THEN 'train'
      |                  WHEN bucket < 62259 THEN 'val'
      |                  ELSE 'test' END split, lang, n_chars FROM b)
      |SELECT split, lang, count(*) n_docs, CAST(sum(n_chars) AS BIGINT) sum_chars
      |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Table profiler: per-column null count, EXACT distinct count and
    * integer-mapped min/max (ids as-is, money/quantity in cents, chars by
    * codepoint, timestamps as epoch seconds), one row per column. Every
    * cell is BIGINT so the unpivot is type-uniform and engine-hashable.
    *
    * Shape: Spark's native multi-column `countDistinct` plans an Expand
    * with k distinct-aggregate paths — measured 3.5 s vs DuckDB 0.09 s at
    * sf0.1. Instead: ONE scan exploding each row into (col_name, value)
    * pairs, then a two-level groupBy — the first level's map-side combine
    * collapses to the per-column distinct-value sets before anything
    * shuffles (~distinct-cardinality rows on the wire, not 5×rows). The
    * null/min/max/count stats ride a separate narrow agg pass, joined on
    * the 5-row output. At web scale swap level 1 for
    * `approx_count_distinct` per column to drop the explode entirely. */
  def profile(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    def nn(c: Column): Column = sum(when(c.isNull, 1L).otherwise(0L))
    val qc = cents(col("l_quantity"))
    val pc = cents(col("l_extendedprice"))
    // (col_name, integer-mapped value) pairs, one scan, narrow fan-out
    val pairs = li.select(explode(array(
        struct(lit("l_orderkey").as("col_name"), col("l_orderkey").as("v")),
        struct(lit("l_quantity_c").as("col_name"), qc.as("v")),
        struct(lit("l_extendedprice_c").as("col_name"), pc.as("v")),
        struct(lit("l_returnflag_a").as("col_name"),
          ascii(col("l_returnflag")).cast("long").as("v")),
        struct(lit("l_shipdate_s").as("col_name"),
          // NTZ parquet layout → instant-exact cast under the UTC session
          unix_micros(col("l_shipdate").cast("timestamp")).as("v")))).as("kv"))
      .select(col("kv.col_name").as("col_name"), col("kv.v").as("v"))
    val distincts = pairs.filter(col("v").isNotNull)
      .groupBy("col_name", "v").agg(count(lit(1)))
      .groupBy("col_name").agg(count(lit(1)).as("n_distinct"))
    val stats = li.agg(
        count(lit(1)).as("n_rows"),
        nn(col("l_orderkey")).as("nn1"),
        min("l_orderkey").as("mn1"), max("l_orderkey").as("mx1"),
        nn(col("l_quantity")).as("nn2"), min(qc).as("mn2"), max(qc).as("mx2"),
        nn(col("l_extendedprice")).as("nn3"), min(pc).as("mn3"), max(pc).as("mx3"),
        nn(col("l_returnflag")).as("nn4"),
        min(ascii(col("l_returnflag"))).cast("long").as("mn4"),
        max(ascii(col("l_returnflag"))).cast("long").as("mx4"),
        nn(col("l_shipdate")).as("nn5"),
        epochS(min(col("l_shipdate"))).as("mn5"),
        epochS(max(col("l_shipdate"))).as("mx5"))
      .selectExpr(
        """stack(5,
          |  'l_orderkey',        n_rows, nn1, mn1, mx1,
          |  'l_quantity_c',      n_rows, nn2, mn2, mx2,
          |  'l_extendedprice_c', n_rows, nn3, mn3, mx3,
          |  'l_returnflag_a',    n_rows, nn4, mn4, mx4,
          |  'l_shipdate_s',      n_rows, nn5, mn5, mx5)
          |AS (col_name, n_rows, n_nulls, min_v, max_v)""".stripMargin)
    // LEFT join + coalesce: an all-NULL column has no distincts group and
    // must still report n_distinct=0 — an inner join would silently drop
    // the most-broken column from a data-quality report
    stats.join(distincts, Seq("col_name"), "left")
      .withColumn("n_distinct", coalesce(col("n_distinct"), lit(0L)))
      .select("col_name", "n_rows", "n_nulls", "n_distinct", "min_v", "max_v")
      .orderBy("col_name")
  }

  val profileSql: String =
    """WITH s AS (
      |  SELECT count(*)::BIGINT n_rows,
      |    sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END)::BIGINT nn1,
      |    count(DISTINCT l_orderkey)::BIGINT nd1,
      |    min(l_orderkey)::BIGINT mn1, max(l_orderkey)::BIGINT mx1,
      |    sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END)::BIGINT nn2,
      |    count(DISTINCT CAST(round(l_quantity*100) AS BIGINT))::BIGINT nd2,
      |    min(CAST(round(l_quantity*100) AS BIGINT)) mn2,
      |    max(CAST(round(l_quantity*100) AS BIGINT)) mx2,
      |    sum(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END)::BIGINT nn3,
      |    count(DISTINCT CAST(round(l_extendedprice*100) AS BIGINT))::BIGINT nd3,
      |    min(CAST(round(l_extendedprice*100) AS BIGINT)) mn3,
      |    max(CAST(round(l_extendedprice*100) AS BIGINT)) mx3,
      |    sum(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END)::BIGINT nn4,
      |    count(DISTINCT l_returnflag)::BIGINT nd4,
      |    min(ascii(l_returnflag))::BIGINT mn4, max(ascii(l_returnflag))::BIGINT mx4,
      |    sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END)::BIGINT nn5,
      |    count(DISTINCT l_shipdate)::BIGINT nd5,
      |    CAST(floor(epoch(min(l_shipdate))) AS BIGINT) mn5,
      |    CAST(floor(epoch(max(l_shipdate))) AS BIGINT) mx5
      |  FROM lineitem)
      |SELECT * FROM (
      |  SELECT 'l_orderkey' col_name, n_rows, nn1 n_nulls, nd1 n_distinct,
      |         mn1 min_v, mx1 max_v FROM s
      |  UNION ALL SELECT 'l_quantity_c', n_rows, nn2, nd2, mn2, mx2 FROM s
      |  UNION ALL SELECT 'l_extendedprice_c', n_rows, nn3, nd3, mn3, mx3 FROM s
      |  UNION ALL SELECT 'l_returnflag_a', n_rows, nn4, nd4, mn4, mx4 FROM s
      |  UNION ALL SELECT 'l_shipdate_s', n_rows, nn5, nd5, mn5, mx5 FROM s)
      |ORDER BY col_name""".stripMargin

  /** Dead-letter quarantine routing: every row annotated with its
    * violated rule names in ONE narrow codegen projection (see
    * [[graft.ops.Expectations.quarantine]]); the query surfaces the
    * quarantined stream with rule attribution — the row-level companion
    * of the aggregate `pipe_data_quality` report. */
  def quarantineRoute(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Expectations._
    val rules = Seq(
      rowNotNull("text"),
      rowInRange("n_chars", lit(100L), lit(1000L)),
      rowAcceptedValues("lang", Seq("en", "de", "es", "fr")))
    val (_, bad) = quarantine(
      t(s, dir, "documents").select("doc_id", "text", "lang", "n_chars"),
      rules)
    bad.select(col("doc_id"),
        array_join(col("violations"), ",").as("violations"),
        size(col("violations")).cast("long").as("n_rules"))
      .orderBy("doc_id")
  }

  val quarantineRouteSql: String =
    """WITH m AS (SELECT doc_id,
      |  list_filter([
      |    CASE WHEN text IS NULL THEN 'not_null:text' END,
      |    CASE WHEN n_chars IS NOT NULL AND (n_chars < 100 OR n_chars > 1000)
      |         THEN 'in_range:n_chars' END,
      |    CASE WHEN lang IS NOT NULL AND lang NOT IN ('en','de','es','fr')
      |         THEN 'accepted_values:lang' END],
      |    x -> x IS NOT NULL) v
      |  FROM documents)
      |SELECT doc_id, array_to_string(v, ',') violations, len(v)::BIGINT n_rules
      |FROM m WHERE len(v) > 0 ORDER BY doc_id""".stripMargin

  /** The end-to-end training-sequence path: CHUNK the corpus (64-token
    * windows, 48 stride — ops/Chunking) then PACK the chunks into
    * 256-token-budget sequences with the distributed prefix sum
    * (ops/Packing) — raw documents → fixed-budget sequences in two
    * composed operators. Chunk order key = doc_id·1000 + chunk_no
    * (chunk_no < 1000 holds for any document under ~48k tokens at this
    * geometry; guarded in-plan — a wider document raises instead of
    * silently colliding keys and making the pack order nondeterministic). */
  def chunkPack(s: SparkSession, dir: String): DataFrame = {
    val BUDGET = 256L
    val ch = graft.ops.Chunking.chunks(
        tPar(s, dir, "documents").select("doc_id", "text"))
      .withColumn("ck",
        when(col("chunk_no") < 1000L, col("doc_id") * 1000L + col("chunk_no"))
          .otherwise(raise_error(lit(
            "chunkPack: chunk_no >= 1000 (document beyond ~48k tokens at 64/48 geometry) — widen the ck multiplier"))
            .cast("long")))
    graft.ops.Packing.runningSum(
        ch.select(col("ck"), col("n_tokens")), "ck", "n_tokens")
      .withColumn("seq_id", expr(s"(cum - n_tokens) div $BUDGET"))
      .groupBy("seq_id")
      .agg(count(lit(1)).as("n_chunks"), sum("n_tokens").as("n_tokens"),
        min("ck").as("first_ck"), max("ck").as("last_ck"))
      .orderBy("seq_id")
  }

  val chunkPackSql: String = {
    val normSql =
      """trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g'))"""
    s"""WITH w AS (SELECT doc_id, string_split($normSql, ' ') words
       |           FROM documents WHERE text IS NOT NULL),
       |c AS (SELECT doc_id, len(words)::BIGINT n,
       |             unnest(generate_series(0, (greatest(len(words)-64,0)+47)//48)) i
       |      FROM w),
       |ch AS (SELECT doc_id*1000 + i ck, least(64, n - i*48) n_tokens FROM c),
       |r AS (SELECT ck, n_tokens,
       |             CAST(sum(n_tokens) OVER (ORDER BY ck
       |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) cum
       |      FROM ch)
       |SELECT (cum - n_tokens) // 256 seq_id, CAST(count(*) AS BIGINT) n_chunks,
       |       CAST(sum(n_tokens) AS BIGINT) n_tokens,
       |       min(ck) first_ck, max(ck) last_ck
       |FROM r GROUP BY 1 ORDER BY seq_id""".stripMargin
  }

  /** CROSS-SPLIT NEAR-DUP LEAKAGE AUDIT — the eval-integrity gate of a
    * training pipeline: a near-duplicate pair straddling train and
    * val/test leaks the held-out answer into training, silently inflating
    * eval scores. One row per unordered split pair: how many near-dup
    * pairs (exact-integer Jaccard ≥ 0.7, `inter·10 ≥ union·7`) land in it,
    * with exact shingle-set intersection/union sums and a `leaky` flag on
    * the off-diagonal cells. A clean 90/5/5 corpus release requires every
    * leaky row to be 0 — or the pipeline reassigns whole dup CLUSTERS to
    * one split (text_dup_clusters + [[graft.ops.SplitAssign]] on the
    * cluster id).
    *
    * Scale shape: the pair frame is the banding-bounded [[graft.ops
    * .NearDup]] candidate set — never all-pairs; and because the split is
    * a PURE FUNCTION of the doc key ([[graft.ops.SplitAssign.assign]],
    * md5-bucket thresholding), both splits are computed as narrow codegen
    * expressions ON the pair rows — ZERO joins back to the corpus (the
    * oracle, engine-agnostic by design, re-derives the same assignment via
    * joins; the hash match proves the no-join form equal). The rollup is
    * one tiny groupBy over pair rows. */
  def splitLeakage(s: SparkSession, dir: String): DataFrame = {
    val near = TextQueries.nearDupPairs(s, dir)
      .filter(col("inter_cnt") * 10L >= col("union_cnt") * 7L)
    val sa = graft.ops.SplitAssign.assign(col("doc_a"),
      graft.ops.SplitAssign.Default905)
    val sb = graft.ops.SplitAssign.assign(col("doc_b"),
      graft.ops.SplitAssign.Default905)
    near.select(least(sa, sb).as("split_a"), greatest(sa, sb).as("split_b"),
        col("inter_cnt"), col("union_cnt"))
      .groupBy("split_a", "split_b")
      .agg(count(lit(1)).as("n_pairs"),
        sum("inter_cnt").as("sum_inter"),
        sum("union_cnt").as("sum_union"))
      .withColumn("leaky", col("split_a") =!= col("split_b"))
      .orderBy("split_a", "split_b")
  }

  val splitLeakageSql: String = {
    val mp = TextQueries.minhashPairsSql.replace("ORDER BY doc_a, doc_b", "")
    s"""WITH mp AS ($mp),
       |near AS (SELECT doc_a, doc_b, inter_cnt, union_cnt FROM mp
       |         WHERE inter_cnt * 10 >= union_cnt * 7),
       |hx AS (SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) h FROM documents),
       |bk AS (SELECT doc_id,
       |         ((strpos('0123456789abcdef', h[1:1]) - 1) * 16
       |          + (strpos('0123456789abcdef', h[2:2]) - 1)) * 256
       |         + ((strpos('0123456789abcdef', h[3:3]) - 1) * 16
       |            + (strpos('0123456789abcdef', h[4:4]) - 1)) bucket
       |       FROM hx),
       |sp AS (SELECT doc_id, CASE WHEN bucket < 58982 THEN 'train'
       |                           WHEN bucket < 62259 THEN 'val'
       |                           ELSE 'test' END split FROM bk),
       |j AS (SELECT least(spa.split, spb.split) split_a,
       |             greatest(spa.split, spb.split) split_b,
       |             inter_cnt, union_cnt
       |      FROM near JOIN sp spa ON near.doc_a = spa.doc_id
       |                JOIN sp spb ON near.doc_b = spb.doc_id)
       |SELECT split_a, split_b, count(*)::BIGINT n_pairs,
       |       CAST(sum(inter_cnt) AS BIGINT) sum_inter,
       |       CAST(sum(union_cnt) AS BIGINT) sum_union,
       |       split_a <> split_b leaky
       |FROM j GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }

  /** CLUSTER-CONSISTENT SPLIT ASSIGNMENT — the FIX the leakage audit
    * ([[splitLeakage]]) points to: a doc's split is keyed by its near-dup
    * COMPONENT's canonical id (min member; singletons key by their own
    * id), so every near-dup cluster lands whole in one split and
    * cross-split leakage at the audit threshold is ZERO by construction
    * (re-proven, not assumed, by EvalAuditSpec's plain-Scala re-audit).
    * Output: per-split doc/clustered-doc/cluster/char rollup — the
    * release-manifest row a corpus card reports.
    *
    * Scale shape: the component table is O(duplicated docs). On a LIGHTLY
    * duplicated corpus that is orders of magnitude smaller than the corpus
    * and BROADCASTS into one narrow pass over the corpus scan (no corpus
    * shuffle) — but at crawl-typical dup rates (30–50% of documents sit in
    * near-dup clusters) it is corpus-order, hundreds of GB at 100 TB, and
    * a forced broadcast dies at Spark's 8 GB cap. The join is therefore
    * SIZE-GATED (round 20, VERDICT r19 #1): the component frame is already
    * materialized (lineage-cut loop inside connectedComponentsAuto), so
    * one cheap cached count decides — ≤ [[clusterBroadcastMaxRows]] rows
    * broadcasts, above it the hint is omitted and the left join shuffles
    * both sides on `doc_id` (sort-merge/AQE — the right plan when the dup
    * table is corpus-order anyway). Both paths are bit-identical
    * (EvalAuditSpec proves it); components come from the banding-bounded
    * pair frame via [[graft.ops.DupGroups.connectedComponentsAuto]]; the
    * split is the same pure key function as [[splitAssign]], applied to
    * the canonical key. */
  def splitClusters(s: SparkSession, dir: String): DataFrame =
    splitClustersGated(s, dir, clusterBroadcastMaxRows)

  /** Broadcast gate for [[splitClusters]]'s component table: (id, comp) is
    * two longs ≈ 16 B/row plus row overhead, so 50 M rows is ~1–2 GB
    * broadcast-encoded — comfortably inside the 8 GB hard cap and typical
    * executor headroom, while anything bigger is better shuffled. */
  private[queries] val clusterBroadcastMaxRows = 50000000L

  private[queries] def splitClustersGated(s: SparkSession, dir: String,
      broadcastMaxRows: Long): DataFrame = {
    val docs = tPar(s, dir, "documents")
    val near = TextQueries.nearDupPairs(s, dir)
      .filter(col("inter_cnt") * 10L >= col("union_cnt") * 7L)
    val members = graft.ops.DupGroups
      .connectedComponentsAuto(near, "doc_a", "doc_b") // (id, comp)
    // the components frame is checkpoint-materialized: this count reads
    // cached blocks, never recomputes the fixpoint loop
    val m = if (members.count() <= broadcastMaxRows) broadcast(members)
            else members
    docs.select(col("doc_id"), col("n_chars"))
      .join(m, col("doc_id") === col("id"), "left")
      .withColumn("split", graft.ops.SplitAssign.assign(
        coalesce(col("comp"), col("doc_id")),
        graft.ops.SplitAssign.Default905))
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("comp").isNotNull, 1L).otherwise(0L)).as("n_clustered_docs"),
        countDistinct(col("comp")).as("n_clusters"),
        sum("n_chars").as("sum_chars"))
      .orderBy("split")
  }

  val splitClustersSql: String = {
    val mp = TextQueries.minhashPairsSql.replace("ORDER BY doc_a, doc_b", "")
    s"""WITH RECURSIVE mp AS ($mp),
       |near AS (SELECT doc_a, doc_b FROM mp WHERE inter_cnt * 10 >= union_cnt * 7),
       |e AS (SELECT doc_a a, doc_b b FROM near
       |      UNION SELECT doc_b a, doc_a b FROM near),
       |r AS (SELECT a, a b FROM (SELECT DISTINCT a FROM e)
       |      UNION
       |      SELECT r.a, e.b FROM r JOIN e ON r.b = e.a),
       |c AS (SELECT a id, min(b) comp FROM r GROUP BY a),
       |k AS (SELECT d.doc_id, d.n_chars, c.comp,
       |             md5(CAST(coalesce(c.comp, d.doc_id) AS VARCHAR)) h
       |      FROM documents d LEFT JOIN c ON d.doc_id = c.id),
       |bk AS (SELECT doc_id, n_chars, comp,
       |         ((strpos('0123456789abcdef', h[1:1]) - 1) * 16
       |          + (strpos('0123456789abcdef', h[2:2]) - 1)) * 256
       |         + ((strpos('0123456789abcdef', h[3:3]) - 1) * 16
       |            + (strpos('0123456789abcdef', h[4:4]) - 1)) bucket
       |       FROM k),
       |sp AS (SELECT doc_id, n_chars, comp,
       |              CASE WHEN bucket < 58982 THEN 'train'
       |                   WHEN bucket < 62259 THEN 'val'
       |                   ELSE 'test' END split FROM bk)
       |SELECT split, count(*)::BIGINT n_docs,
       |       CAST(sum(CASE WHEN comp IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) n_clustered_docs,
       |       CAST(count(DISTINCT comp) AS BIGINT) n_clusters,
       |       CAST(sum(n_chars) AS BIGINT) sum_chars
       |FROM sp GROUP BY 1 ORDER BY 1""".stripMargin
  }

  val queries: Map[String, QueryFn] = Map(
    "pipe_split_leakage" -> (splitLeakage _),
    "pipe_split_clusters" -> (splitClusters _),
    "pipe_chunk_pack" -> (chunkPack _),
    "pipe_quarantine" -> (quarantineRoute _),
    "pipe_profile" -> (profile _),
    "pipe_split_assign" -> (splitAssign _),
    "pipe_clean_corpus" -> (cleanCorpus _),
    "pipe_shard_plan" -> (shardPlan _),
    "pipe_pack_sequences" -> (packSequences _),
    "pipe_zorder_layout" -> (zorderLayout _),
    "pipe_skew_audit" -> (skewAudit _),
    "pipe_data_quality" -> (dataQuality _),
    "pipe_quality_by_source" -> (qualityBySource _),
  )

  val oracle: Map[String, String] = Map(
    "pipe_split_leakage" -> splitLeakageSql,
    "pipe_split_clusters" -> splitClustersSql,
    "pipe_chunk_pack" -> chunkPackSql,
    "pipe_quarantine" -> quarantineRouteSql,
    "pipe_profile" -> profileSql,
    "pipe_split_assign" -> splitAssignSql,
    "pipe_clean_corpus" -> cleanCorpusSql,
    "pipe_shard_plan" -> shardPlanSql,
    "pipe_pack_sequences" -> packSequencesSql,
    "pipe_zorder_layout" -> zorderLayoutSql,
    "pipe_skew_audit" -> skewAuditSql,
    "pipe_data_quality" -> dataQualitySql,
    "pipe_quality_by_source" -> qualityBySourceSql,
  )
}
