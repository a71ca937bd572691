package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization + domain extraction — the primitives behind
  * URL-level dedup, per-domain caps, and domain blocklists in a web-scale
  * training pipeline (C4/RefinedWeb dedup documents by normalized URL
  * before any content pass; per-domain caps bound any single site's share
  * of the corpus).
  *
  * Everything here is a pure codegen NARROW map (chained `regexp_replace`
  * / `regexp_extract` — no UDF, no shuffle); the patterns stay in the
  * RE2-compatible subset (see [[Redact]]) so the DuckDB oracle runs the
  * same strings verbatim. Each strip pattern is anchored and matches at
  * most once, so first-match and global replace semantics agree across
  * engines.
  */
object UrlOps {

  /** Canonical URL: lowercase, scheme and leading `www.` stripped, query
    * string / fragment dropped, trailing slash removed — the equivalence
    * class URL-dedup keys on (`http://WWW.A.com/p/1/?utm=x` ≡
    * `https://a.com/p/1`). */
  def canonicalUrl(url: Column): Column = {
    val steps = Seq(
      "^https?://"   -> "", // scheme
      "^(www\\.)+"   -> "", // canonical-host www prefix(es) — all of them,
                            // so canonicalUrl(canonicalUrl(u)) == canonicalUrl(u)
      "[?#].*$"      -> "", // query string + fragment
      "/$"           -> "") // trailing slash
    steps.foldLeft(lower(url)) { case (acc, (p, r)) => regexp_replace(acc, p, r) }
  }

  /** Host part of a CANONICAL url (everything before the first `/`). */
  def hostOf(canonical: Column): Column =
    regexp_extract(canonical, "^([^/]+)", 1)

  /** Registered domain: the last two dot-separated labels of a host
    * (`a.b.site.co` → `site.co`). Public-suffix lists are config at real
    * scale; two labels is the deterministic engine default. */
  def registeredDomainOf(host: Column): Column =
    when(host.rlike("[^.]+\\.[^.]+$"),
      regexp_extract(host, "([^.]+\\.[^.]+)$", 1)).otherwise(host)
}
