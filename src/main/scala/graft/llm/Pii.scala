package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection and redaction for training-data pipelines: find and
  * mask emails, phone numbers, and IPv4 addresses before a corpus is
  * shipped to training.
  *
  * Scale shape: every operator here is a pure per-row projection of
  * codegen'd built-ins (`regexp_count` / `regexp_replace`) — no
  * shuffle, no UDF, no state; throughput is regex-engine-bound and
  * embarrassingly parallel across partitions, which is exactly what
  * a 100 TB scrub pass needs.
  *
  * Patterns are RE2-compatible (no lookaround, no backreferences) so
  * the same regex runs in Spark (Java regex) and in RE2-based
  * engines; anchored with `\b` word boundaries, which both dialects
  * support.
  */
object Pii {
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phoneRe = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"
  val ipRe = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  def emailCount(text: Column): Column = regexp_count(text, lit(emailRe))
  def phoneCount(text: Column): Column = regexp_count(text, lit(phoneRe))
  def ipCount(text: Column): Column = regexp_count(text, lit(ipRe))

  /** Mask all supported PII kinds with typed placeholder tokens.
    * Email first (its local part may contain digits a later pattern
    * could clip), then phone, then IP; the placeholders themselves
    * match none of the patterns, so redaction is idempotent.
    */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailRe, "<EMAIL>"),
        phoneRe, "<PHONE>"),
      ipRe, "<IP>")
}
