package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, LongType}

/** EXACT set-similarity self-join via prefix filtering — the deterministic
  * complement of the probabilistic MinHash-LSH path in [[NearDup]]: returns
  * precisely the pairs with Jaccard ≥ num/den, no false negatives, without
  * ever materializing the O(n²) pair set.
  *
  * Algorithm (prefix-filtering principle; Chaudhuri/Ganti/Kaushik ICDE'06,
  * Xiao et al. WWW'08 "PPJoin", distributed form per Vernica/Carey/Li
  * SIGMOD'10):
  *   1. order every set's tokens canonically by ascending global document
  *      frequency (rare tokens first, ties by token value);
  *   2. each set emits only its PREFIX — the first
  *      `|A| - ceil(t·|A|) + 1` tokens in that order. Any pair with
  *      Jaccard ≥ t must share at least one prefix token: a pair sharing
  *      none can overlap on at most `ceil(t·|A|) - 1 < t·|A| ≤ t·|union|`
  *      tokens of A, so its Jaccard is < t;
  *   3. candidates come from ONE equi-join on prefix token (plus the
  *      length filter `t·|A| ≤ |B| ≤ |A|/t`, also implied by Jaccard ≥ t),
  *      then PPJoin's positional filter prunes pairs whose earliest shared
  *      prefix position already caps the possible overlap below the
  *      threshold (see the inline proof at the groupBy below);
  *   4. survivors are verified exactly with an `array_intersect` count —
  *      integer threshold arithmetic (`inter·den ≥ union·num`), so the
  *      result is bit-identical to a brute-force scan.
  *
  * The reference has no similarity join at all (its only dedup is the exact
  * SBF filter, operator/SBFDeduplicationFilter.scala:85-108) — this is part
  * of the additive training-data-pipeline surface (SURVEY.md §2.10).
  *
  * Scale shape (100 TB contract): the token-frequency table is
  * vocabulary-bounded; prefix emission is a narrow map after one
  * groupBy(id); candidate generation is one equi-join shuffle keyed on
  * prefix token, O(near-duplicates) not O(n²) because rare-first ordering
  * sends high-df tokens to the suffix where they are never join keys; the
  * verify step shuffles only the candidate set. No collect, no cross join,
  * no driver loop.
  */
object SimilarityJoin {

  /** All pairs (id_a < id_b) from `sets` with Jaccard(setCol_a, setCol_b)
    * ≥ num/den. Output: id_a, id_b, inter_cnt, union_cnt (longs), exact.
    *
    * `sets` must have one row per id; the token array is deduplicated
    * internally; empty sets (and null arrays) never pair.
    */
  def jaccardSelfJoin(
      sets: DataFrame,
      idCol: String,
      setCol: String,
      num: Int,
      den: Int): DataFrame = {
    require(num > 0 && num <= den, s"threshold $num/$den not in (0,1]")

    // toks feeds both the df aggregate and the canonical-order groupBy —
    // persisted so the caller's token derivation (typically a full-corpus
    // shingle-hash pass, sometimes plus a dedup groupBy) runs once, not
    // once per consumer.
    val toks = graft.util.CacheBin.persist(sets
      .select(col(idCol).as("id"), array_distinct(col(setCol)).as("toks"))
      .filter(col("toks").isNotNull && size(col("toks")) > 0))

    // Global token document frequency — vocabulary-bounded; drives the
    // canonical rare-first ordering that makes the prefix filter selective.
    val dfreq = toks
      .select(explode(col("toks")).as("tok"))
      .groupBy("tok")
      .agg(count(lit(1)).as("df"))

    // Canonical order: (df, tok) ascending. collect_list order is
    // nondeterministic but array_sort canonicalizes it; (df, tok) pairs are
    // unique within a set because the tokens are distinct.
    val ordered = graft.util.CacheBin.persist(
      toks
        .select(col("id"), explode(col("toks")).as("tok"))
        .join(dfreq, "tok")
        .groupBy("id")
        .agg(array_sort(collect_list(struct(col("df"), col("tok")))).as("dt"))
        .select(
          col("id"),
          expr("transform(dt, x -> x.tok)").as("toks"),
          size(col("dt")).as("len")))

    // Prefix length |A| - ceil(t|A|) + 1, exact integer ceil. posexplode
    // keeps each prefix token's 0-based position in the canonical order —
    // the positional filter below needs it.
    val prefixLen =
      expr(s"cast(len - ((len * $num + ${den - 1}) div $den) + 1 as int)")
    val prefix = ordered.select(
      col("id"),
      col("len"),
      posexplode(slice(col("toks"), lit(1), prefixLen)))

    // Candidate pairs: share a prefix token AND pass the length filter
    // (Jaccard ≥ t ⇒ min(|A|,|B|) ≥ t·max(|A|,|B|)). A pair may share
    // several prefix tokens; the groupBy both dedupes and retains the
    // EARLIEST shared position on each side for the positional filter.
    //
    // Positional filter (PPJoin): common prefix tokens appear in the same
    // relative order in both arrays (both are sorted by the one global
    // order), so min(pa) and min(pb) are positions of the SAME token t0 —
    // and no common token can precede t0 at all (a common token before t0
    // on either side would sit before t0's position on BOTH sides, hence
    // inside both prefixes, contradicting t0 minimal). Therefore
    // |A∩B| ≤ min(|A|-pa, |B|-pb); with Jaccard ≥ t requiring
    // inter·(num+den) ≥ num·(|A|+|B|), any pair whose bound misses that is
    // pruned BEFORE the expensive verify. On common-token-heavy corpora
    // (tiny vocabularies) this is the filter that matters: unrelated pairs
    // share only high-df tokens, which the rare-first order pushes to late
    // positions, collapsing the bound.
    val cand = prefix
      .select(col("col").as("tok"), col("id").as("id_a"),
        col("len").as("len_a"), col("pos").as("pa"))
      .join(
        prefix.select(col("col").as("tok_b"), col("id").as("id_b"),
          col("len").as("len_b"), col("pos").as("pb")),
        col("tok") === col("tok_b") && col("id_a") < col("id_b") &&
          col("len_a") * num <= col("len_b") * den &&
          col("len_b") * num <= col("len_a") * den)
      .groupBy("id_a", "id_b", "len_a", "len_b")
      .agg(min(col("pa")).as("pa"), min(col("pb")).as("pb"))
      .filter(
        least(col("len_a") - col("pa"), col("len_b") - col("pb")) *
          (num + den) >= (col("len_a") + col("len_b")) * num)
      .select("id_a", "id_b")

    // Exact verification on the candidate set only. Long-token sets (hashed
    // shingles — the recommended scale form) verify with the codegen'd
    // sorted-merge graft_intersect_size (requires
    // graft.functions.GraftFunctions.register, like every graft_* caller);
    // anything else falls back to the builtin array_intersect.
    val isLong = sets.schema(setCol).dataType match {
      case ArrayType(LongType, _) => true
      case _                      => false
    }
    def interOf(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      if (isLong) call_function("graft_intersect_size", a, b)
      else size(array_intersect(a, b)).cast("long")
    val fa = ordered.select(
      col("id").as("va"), col("toks").as("toks_a"), col("len").as("la"))
    val fb = ordered.select(
      col("id").as("vb"), col("toks").as("toks_b"), col("len").as("lb"))
    cand
      .join(fa, col("id_a") === col("va"))
      .join(fb, col("id_b") === col("vb"))
      .select(
        col("id_a"),
        col("id_b"),
        interOf(col("toks_a"), col("toks_b")).as("inter_cnt"),
        (col("la") + col("lb")).cast("long").as("sz"))
      .withColumn("union_cnt", col("sz") - col("inter_cnt"))
      .filter(col("inter_cnt") * den >= col("union_cnt") * num)
      .select("id_a", "id_b", "inter_cnt", "union_cnt")
  }

  /** All ORDERED pairs (id_a ≠ id_b) with CONTAINMENT
    * |A∩B| / |A| ≥ num/den — the asymmetric predicate Jaccard can't
    * express: a short document quoted/wrapped inside a longer one has
    * high containment but low Jaccard, which is exactly the
    * subset-duplication (and eval-set contamination) case. Output:
    * id_a, id_b, inter_cnt, len_a, len_b — exact, no false negatives.
    *
    * One-sided prefix filtering: with tokens in the same global
    * rare-first canonical order as [[jaccardSelfJoin]], A must share one
    * of its first `|A| − ⌈t·|A|⌉ + 1` tokens with B (missing the whole
    * prefix caps the overlap at ⌈t|A|⌉ − 1 < t·|A|) — but B's witness may
    * be ANY of B's tokens, so the PROBE side emits prefixes while the
    * INDEX side emits every token. The join stays selective because the
    * probe prefix is rare-first: high-df tokens sit in the suffix and are
    * never probe keys, so per-key candidate volume is df(rare token) ·
    * prefix-emissions — never O(n²). The shared canonical order also
    * keeps PPJoin's positional bound valid one-sidedly: the earliest
    * shared pair (pa, pb) is the same token, no common token precedes it
    * on either side, so |A∩B| ≤ min(|A|−pa, |B|−pb) prunes before the
    * verify. Length filter: |B|·den ≥ |A|·num (the overlap can't exceed
    * |B|). Verify: exact intersect, integer `inter·den ≥ |A|·num`. */
  def containmentSelfJoin(
      sets: DataFrame,
      idCol: String,
      setCol: String,
      num: Int,
      den: Int): DataFrame = {
    require(num > 0 && num <= den, s"threshold $num/$den not in (0,1]")

    // persisted for the same two-consumer reason as [[jaccardSelfJoin]]
    val toks = graft.util.CacheBin.persist(sets
      .select(col(idCol).as("id"), array_distinct(col(setCol)).as("toks"))
      .filter(col("toks").isNotNull && size(col("toks")) > 0))
    val dfreq = toks
      .select(explode(col("toks")).as("tok"))
      .groupBy("tok")
      .agg(count(lit(1)).as("df"))
    val ordered = graft.util.CacheBin.persist(
      toks
        .select(col("id"), explode(col("toks")).as("tok"))
        .join(dfreq, "tok")
        .groupBy("id")
        .agg(array_sort(collect_list(struct(col("df"), col("tok")))).as("dt"))
        .select(
          col("id"),
          expr("transform(dt, x -> x.tok)").as("toks"),
          size(col("dt")).as("len")))

    // EXTENDED probe prefix: the minimal containment prefix is
    // |A| − ⌈t·|A|⌉ + 1 tokens (sharing NONE of it caps the overlap below
    // t·|A|), and probing `Extra` tokens deeper buys a witness-COUNT
    // bound: A misses at most m = |A| − ⌈t·|A|⌉ of its own tokens, so a
    // true pair must share ≥ q − m tokens of A's first q. With the
    // minimal prefix that bound is the trivial "≥ 1"; at q = prefix+8 it
    // becomes "≥ 9" — the filter that carries low-entropy corpora, where
    // duplication inflates every token's df until "rare" prefix tokens
    // admit half the corpus (measured on the replicated 100× rehearsal:
    // 141 M candidate pairs pass the 1-witness prefix test, and shipping
    // their token arrays into the verify was a 9+ minute spilling join;
    // the 9-witness count bound passes ~the true pairs only).
    val Extra = 8
    val prefixLen = expr(
      s"cast(least(len - ((len * $num + ${den - 1}) div $den) + 1 + $Extra, len) as int)")
    val probe = ordered.select(col("id").as("id_a"), col("len").as("len_a"),
      posexplode(slice(col("toks"), lit(1), prefixLen)))
      .select(col("id_a"), col("len_a"), col("pos").as("pa"), col("col").as("tok"))
    val index = ordered.select(col("id").as("id_b"), col("len").as("len_b"),
      posexplode(col("toks")))
      .select(col("id_b"), col("len_b"), col("pos").as("pb"), col("col").as("tok_b"))

    // One witness row per (pair, shared token in A's q-window): the
    // groupBy is map-side combinable, its shuffle rows are compact
    // (ids + 4 longs — no arrays), and BOTH lossless pair filters run on
    // the aggregate before anything wide is shipped:
    //  - witness count nw ≥ q − m (see above);
    //  - PPJoin positional bound min(|A|−pa, |B|−pb) ≥ ⌈t·|A|⌉ — valid on
    //    the aggregated minima because for a TRUE pair the globally
    //    earliest common token t0 lies inside the minimal prefix ⊆
    //    q-window, so min(pa)/min(pb) are exactly t0's positions (the
    //    same-token argument of jaccardSelfJoin); a false pair can only
    //    get a LOOSER bound and is killed by the exact verify.
    val cand = probe
      .join(index,
        col("tok") === col("tok_b") && col("id_a") =!= col("id_b") &&
          col("len_b") * den >= col("len_a") * num)
      .groupBy("id_a", "id_b", "len_a", "len_b")
      .agg(count(lit(1)).as("nw"), min("pa").as("pa"), min("pb").as("pb"))
      .filter(
        col("nw") >=
          least(expr(s"cast(len_a - ((len_a * $num + ${den - 1}) div $den) + 1 + $Extra as int)"),
            col("len_a")) - (col("len_a") - expr(s"(len_a * $num + ${den - 1}) div $den")) &&
          least(col("len_a") - col("pa"), col("len_b") - col("pb")) * den >=
            col("len_a") * num)
      .select("id_a", "id_b")

    val isLong = sets.schema(setCol).dataType match {
      case ArrayType(LongType, _) => true
      case _                      => false
    }
    def interOf(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      if (isLong) call_function("graft_intersect_size", a, b)
      else size(array_intersect(a, b)).cast("long")
    val fa = ordered.select(
      col("id").as("va"), col("toks").as("toks_a"), col("len").as("la"))
    val fb = ordered.select(
      col("id").as("vb"), col("toks").as("toks_b"), col("len").as("lb"))
    cand
      .join(fa, col("id_a") === col("va"))
      .join(fb, col("id_b") === col("vb"))
      .select(
        col("id_a"),
        col("id_b"),
        interOf(col("toks_a"), col("toks_b")).as("inter_cnt"),
        col("la").cast("long").as("len_a"),
        col("lb").cast("long").as("len_b"))
      .filter(col("inter_cnt") * den >= col("len_a") * num)
  }
}
