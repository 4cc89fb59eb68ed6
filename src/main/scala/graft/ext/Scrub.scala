package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII scrubbing for training-data curation: detect and redact email
  * addresses, phone numbers, and IPv4 addresses from free text. Pure
  * Column regexp expressions — per-row, no shuffle, whole-stage codegen —
  * so scrubbing rides the same scan as every other per-document signal.
  *
  * The patterns deliberately use only portable regex constructs
  * (character classes, bounded repeats, non-capturing groups) that mean
  * the same thing in Java regex (Spark) and RE2 (DuckDB oracle) — no
  * lookaround, no backreferences.
  */
object Scrub {

  /** local@domain.tld — the pragmatic curation-grade pattern, not RFC
    * 5322 (which no scrubber uses in practice).
    */
  val EmailRegex = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dashed international-ish numbers: optional +CC then 2–3 dash-joined
    * groups of 2–4 digits (`+1-555-0042`, `+41-22-730-5989`).
    */
  val PhoneRegex = "\\+?[0-9]{1,3}(?:-[0-9]{2,4}){2,3}"

  /** Dotted-quad IPv4 (permissive octets — scrubbing favors recall). */
  val Ipv4Regex = "(?:[0-9]{1,3}\\.){3}[0-9]{1,3}"

  def emailCount(text: Column): Column =
    regexp_count(text, lit(EmailRegex)).cast("long")

  def phoneCount(text: Column): Column =
    regexp_count(text, lit(PhoneRegex)).cast("long")

  def ipv4Count(text: Column): Column =
    regexp_count(text, lit(Ipv4Regex)).cast("long")

  /** Replace all PII spans with type tags. Order matters: emails first
    * (their local parts contain digit runs), then phones, then IPv4
    * (dashless, so the phone pass can't eat an octet).
    */
  def redact(text: Column): Column = {
    val noEmail = regexp_replace(text, EmailRegex, "<EMAIL>")
    val noPhone = regexp_replace(noEmail, PhoneRegex, "<PHONE>")
    regexp_replace(noPhone, Ipv4Regex, "<IP>")
  }
}
