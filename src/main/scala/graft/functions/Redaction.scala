package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII scrubbing for training corpora: regex redaction of emails,
  * phone-shaped digit runs, and IPv4 literals, plus per-document match
  * counts for the scrub report. The standard curation step between
  * dedup and packing — leaked contact strings are both a privacy and a
  * memorization liability.
  *
  * Patterns are deliberately conservative ASCII classes shared
  * verbatim with the DuckDB oracle (Java regex and RE2 agree on this
  * subset: character classes, +/quantifiers, alternation — no
  * backrefs, no lookaround). Replacement is longest-pattern-first so
  * an email's digits are not half-eaten by the phone pattern.
  *
  * Scale: narrow per-row regexp expressions — codegen'd, pipelined
  * inside the scan, zero shuffle.
  */
object Redaction {
  /** (name, pattern, replacement token), applied in order. */
  val patterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", "\\d{3}[-.]\\d{3}[-.]\\d{4}", "<PHONE>"),
    ("ipv4", "\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}", "<IP>"))

  /** Scrubbed text: every pattern replaced by its token, in order. */
  def redact(text: Column): Column =
    patterns.foldLeft(text) { case (c, (_, p, tok)) =>
      regexp_replace(c, p, tok)
    }
  def redactSql(x: String): String =
    patterns.foldLeft(x) { case (e, (_, p, tok)) =>
      s"regexp_replace($e, '$p', '$tok', 'g')"
    }

  /** Non-overlapping match count for one pattern (pre-redaction). */
  def matchCount(text: Column, pattern: String): Column =
    regexp_count(text, lit(pattern)).cast("long")
  def matchCountSql(x: String, pattern: String): String =
    s"CAST(len(regexp_extract_all($x, '$pattern')) AS BIGINT)"
}
