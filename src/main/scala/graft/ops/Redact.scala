package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII redaction for corpus preparation — regex scrubbing of emails, IPv4
  * addresses, and phone-shaped digit runs before text ships to training.
  *
  * Patterns are intentionally RE2-compatible (no backrefs, no lookaround) so
  * the exact same patterns run in Spark (Java regex), DuckDB (RE2), and any
  * downstream scrubber, and the DuckDB oracle can mirror the query verbatim.
  *
  * Everything is `regexp_replace` — codegen'd, scan-shaped, no UDFs: at
  * 100 TB this is a pure map over the text column with zero shuffle.
  */
object Redact {

  /** Ordered (pattern, replacement) rules. Email runs before phone so the
    * digits inside a local-part can't be half-eaten by the phone rule.
    */
  val rules: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"                -> "<IP>",
    "\\b\\d{3}-\\d{4}\\b"                             -> "<PHONE>"
  )

  /** Apply every rule in order. Spark's regexp_replace is global. */
  def pii(text: Column): Column =
    rules.foldLeft(text) { case (c, (pat, rep)) => regexp_replace(c, pat, rep) }

  /** True when no rule still matches — e.g. an assertion before export. */
  def isClean(text: Column): Column =
    rules.map { case (pat, _) => !text.rlike(pat) }.reduce(_ && _)
}
