package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML boilerplate stripping for crawl-derived corpora: drop comments and
  * tags, decode the common entities, collapse whitespace. The trafilatura
  * step of a training-data pipeline reduced to its deterministic core —
  * expression-only (codegen'd regexp chain), scan-shaped, no UDF.
  *
  * The patterns are RE2-compatible (no backtracking pathology on
  * adversarial markup) and '>'-safe: comments are matched non-greedily with
  * DOTALL (a '>' or newline inside `<!-- ... -->` must not end the match),
  * and tags admit quoted attribute values so `<img alt="x > y">` strips
  * whole instead of leaking `y">`. Entity order matters: `&amp;` decodes
  * LAST so double-escaped text (`&amp;lt;`) unescapes exactly one level per
  * pass — same contract as Python's html.unescape applied once.
  */
object Html {
  def stripTags(c: Column): Column = {
    val noComments = regexp_replace(c, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComments, "<(?:[^>\"']|\"[^\"]*\"|'[^']*')*>", " ")
    val d1 = regexp_replace(noTags, "&lt;", "<")
    val d2 = regexp_replace(d1, "&gt;", ">")
    val d3 = regexp_replace(d2, "&quot;", "\"")
    val d4 = regexp_replace(d3, "&nbsp;", " ")
    val d5 = regexp_replace(d4, "&amp;", "&")
    trim(regexp_replace(d5, "\\s+", " "))
  }
}
