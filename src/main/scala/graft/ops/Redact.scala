package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Regex-based PII scrubbing — the redaction pass a training-data pipeline
  * runs before anything else sees the text (C4/RefinedWeb-style cleanup;
  * a training-pipeline extension beyond the reference surface).
  *
  * Patterns are deliberately restricted to the RE2-compatible subset of
  * Java regex — character classes, bounded repetition, `\b`, NO lookaround
  * and NO backreferences — so the exact same rule strings run on RE2-based
  * engines too (the DuckDB oracle executes them verbatim; Java and RE2
  * agree on this subset, including leftmost-longest vs leftmost-first
  * differences which bounded non-alternating patterns don't expose).
  *
  * Scale shape: redaction and match counting are pure NARROW maps (codegen
  * `regexp_replace`/`regexp_count` — no UDF, no shuffle); a corpus-wide
  * redaction report is those maps plus one map-side-combined groupBy.
  *
  * Rule order matters and [[default]] is ordered most-specific-first:
  * emails before IPs (an address can embed digit runs), SSN-shaped ids
  * before phones (3-2-4 vs 3-3-4 grouping — disjoint, but order makes the
  * intent explicit). Replacements contain no digits or `@`, so applying
  * the chain twice is the identity on already-redacted text (idempotence,
  * pinned by RedactSpec — reruns and overlapping pipeline stages are safe).
  */
object Redact {

  /** One redaction rule: `pattern` (RE2-compatible regex) → `replacement`
    * literal tag. */
  final case class Rule(name: String, pattern: String, replacement: String)

  val email: Rule = Rule("email",
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
  /** Greedy left-to-right: "1.2.3.4.5" redacts its first 4 octets. */
  val ipv4: Rule = Rule("ipv4",
    "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>")
  /** SSN-shaped 3-2-4 digit ids. */
  val ssnId: Rule = Rule("ssn_id", "\\b\\d{3}-\\d{2}-\\d{4}\\b", "<ID>")
  /** NANP-style 3-3-4 dashed phone numbers. */
  val phone: Rule = Rule("phone", "\\b\\d{3}-\\d{3}-\\d{4}\\b", "<PHONE>")

  val default: Seq[Rule] = Seq(email, ipv4, ssnId, phone)

  /** Redacted text: the rule chain applied in order, each a codegen'd
    * `regexp_replace` of ALL matches. */
  def redact(text: Column, rules: Seq[Rule] = default): Column =
    rules.foldLeft(text)((acc, r) => regexp_replace(acc, r.pattern, r.replacement))

  /** Number of matches of one rule in the ORIGINAL text (count before
    * redacting — earlier rules in a chain can consume a later rule's
    * matches). */
  def matches(text: Column, rule: Rule): Column =
    regexp_count(text, lit(rule.pattern)).cast("long")
}
