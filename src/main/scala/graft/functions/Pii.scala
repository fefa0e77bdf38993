package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection and redaction for training-data curation: the masking pass
  * every corpus runs before pre-training (emails, IPv4 addresses, phone
  * numbers, long digit runs → typed placeholder tokens).
  *
  * The patterns are deliberately the ASCII-only common dialect of Java regex
  * and RE2 — `\d`, `\b`, bounded quantifiers, plain character classes — so
  * the DuckDB oracle replays the identical passes and the gate verifies the
  * redacted bytes, not just the counts. Passes apply in specificity order
  * (email before ip before phone before bare numbers) on the progressively
  * redacted text, so a later generic pattern never re-matches inside an
  * earlier placeholder's context.
  *
  * Everything is `regexp_replace`/`regexp_count` — codegen'd Catalyst
  * expressions, no UDFs — so the 100 TB plan is map-only at scan speed.
  */
object Pii {

  /** (name, pattern, replacement token), applied in order. */
  val Passes: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
    ("phone", "\\b\\d{3}-\\d{3}-\\d{4}\\b", "<PHONE>"),
    ("num", "\\b\\d+\\b", "<NUM>"))

  /** Fully redacted text: every pass applied in order. */
  def redact(text: Column): Column =
    Passes.foldLeft(text) { case (c, (_, re, tok)) =>
      regexp_replace(c, re, tok)
    }

  /** Per-pass match counts, each measured on the text AFTER the earlier
    * passes have redacted it (so e.g. the digits of an IP are never also
    * counted as bare numbers). Returns (name → count column).
    */
  def counts(text: Column): Seq[(String, Column)] = {
    var cur = text
    Passes.map { case (name, re, tok) =>
      val n = regexp_count(cur, lit(re))
      cur = regexp_replace(cur, re, tok)
      name -> n
    }
  }
}
