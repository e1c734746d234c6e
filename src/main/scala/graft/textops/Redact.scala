package graft.textops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII redaction for training-data pipelines: emails, IPv4 addresses and
  * long digit runs (phone / account / card numbers) are replaced with
  * typed placeholder tokens, the standard pre-training scrub (the C4 /
  * Dolma / RefinedWeb cleaning recipes all carry an equivalent pass).
  *
  * Pure `regexp_replace` projections — codegen'd builtins, no UDFs, no
  * shuffle; scales linearly with input splits at 100 TB. Patterns stay
  * inside the RE2-compatible subset (no lookaround, no backreferences) so
  * the DuckDB oracle can run the IDENTICAL pattern strings.
  *
  * Order matters and is fixed: emails first (their local parts contain
  * digit runs), then IPv4 (dotted quads would otherwise be split by the
  * digit-run rule), then standalone digit runs. Placeholders contain no
  * digits, so later passes never re-match earlier replacements.
  */
object Redact {

  /** (name, pattern, placeholder) — applied in declaration order. */
  val rules: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
    ("num", "\\d{7,}", "<NUM>"))

  /** Text with all three PII classes replaced by their placeholders. */
  def redactPii(text: Column): Column =
    rules.foldLeft(text) { case (c, (_, pat, repl)) =>
      regexp_replace(c, pat, repl)
    }

  /** Per-class match counts over the ORIGINAL text, one `regexp_count`
    * pass per pattern — independent counts, so a pattern nested inside a
    * higher-priority match (a ≥7-digit run in an email's local part)
    * counts for BOTH classes. Prefer [[redactAll]] where the redacted
    * text is also needed: one traversal instead of 2·k, and its counts
    * are redactions actually performed.
    */
  def redactionCounts(text: Column): Seq[(String, Column)] =
    rules.map { case (name, pat, _) =>
      s"n_${name}s" -> regexp_count(text, lit(pat))
    }

  /** Count-column names published by [[redactAll]], in rule order. */
  val countNames: Seq[String] = rules.map { case (n, _, _) => s"n_${n}s" }

  /** Redacted text AND per-class redaction counts in ONE alternation
    * pass ([[graft.functions.TextExprs.RedactPiiAll]]):
    * struct(redacted, n_emails, n_ips, n_nums). The redacted string is
    * identical to [[redactPii]]'s sequential chain (placeholders are
    * inert and alternation priority = pass order — gate-checked against
    * the sequential DuckDB restatement); the counts are redactions
    * performed per class, so nested lower-priority matches are not
    * double-counted. 6 regex traversals fused into 1 — q54 end-to-end
    * measured 0.85 → 0.40 s at sf0.1 (the remainder is mostly the
    * per-query harness floor, not regex time).
    */
  def redactAll(text: Column): Column =
    graft.functions.TextExprs.redactPiiAll(text, countNames,
      rules.map(_._2), rules.map(_._3))
}
