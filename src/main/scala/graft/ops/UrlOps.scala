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
    * scale — see the suffix-list overload; two labels is the deterministic
    * engine default. */
  def registeredDomainOf(host: Column): Column =
    when(host.rlike("[^.]+\\.[^.]+$"),
      regexp_extract(host, "([^.]+\\.[^.]+)$", 1)).otherwise(host)

  /** Multi-label public suffixes under which the registrable name is one
    * MORE label (`shop.example.co.uk` → `example.co.uk`). A tiny embedded
    * default covering the common ccTLD second-level registries; real
    * deployments pass the full public-suffix list
    * (https://publicsuffix.org) through job config. */
  val DEFAULT_SUFFIXES: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "or.jp", "ne.jp", "ac.jp",
    "co.nz", "org.nz", "net.nz",
    "co.in", "org.in", "net.in",
    "com.br", "org.br", "net.br",
    "com.cn", "org.cn", "net.cn",
    "co.za", "org.za",
    "com.mx", "com.ar", "com.tr", "com.sg", "com.hk", "com.tw")

  /** Public-suffix-aware registered domain: for a host under a listed
    * multi-label suffix, keep suffix + one label; otherwise the two-label
    * default. Still a pure codegen narrow map — the suffix list compiles
    * into one anchored alternation per suffix length (the list is config,
    * not data, so it broadcasts inside the plan as literals). */
  def registeredDomainOf(host: Column, suffixes: Seq[String]): Column = {
    require(suffixes.forall(s => s.nonEmpty && s.contains('.') &&
      s.matches("[a-z0-9.-]+")),
      "public suffixes must be lowercase multi-label names like co.uk")
    // longest suffixes first so e.g. a 3-label entry would win over a
    // 2-label prefix of it
    val byLen = suffixes.distinct.sortBy(s => (-s.count(_ == '.'), s))
    val arms = byLen.groupBy(_.count(_ == '.')).toSeq.sortBy(-_._1)
      .map { case (_, group) =>
        // the require above limits suffixes to [a-z0-9.-]; dot is the only
        // regex metacharacter in that set outside a character class
        val alt = group.map(_.replace(".", "\\.")).mkString("(?:", "|", ")")
        val pat = s"([^.]+\\.$alt)$$"
        (host.rlike(pat), regexp_extract(host, pat, 1))
      }
    arms.foldRight(registeredDomainOf(host)) { case ((cond, extract), els) =>
      when(cond, extract).otherwise(els)
    }
  }
}
