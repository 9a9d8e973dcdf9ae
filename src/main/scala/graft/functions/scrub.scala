package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** PII detection / redaction primitives for training-data curation —
  * the standard scrubbing pass every public web-corpus pipeline runs
  * before training. Pure Catalyst regexp expressions (codegen'd, no
  * UDFs), with patterns restricted to syntax valid in BOTH Java regex
  * (Spark) and RE2 (DuckDB oracle): no lookaround, no backreferences.
  */
object scrub {

  /** Conservative email pattern (user@host.tld). */
  val emailRe: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** US-style short phone fragment NNN-NNNN (word-bounded). */
  val phoneRe: String = "\\b\\d{3}-\\d{4}\\b"

  /** Dotted-quad IPv4 literal (word-bounded). */
  val ipRe: String = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Count non-overlapping matches of `re` in `c`. */
  def countMatches(c: Column, re: String): Column =
    size(regexp_extract_all(c, lit(re), lit(0))).cast(LongType)

  /** Redact emails, then phones, then IPv4 literals (fixed order so the
    * output is well-defined when classes could overlap). */
  def redactPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, emailRe, "[EMAIL]"),
        phoneRe, "[PHONE]"),
      ipRe, "[IP]")
}
