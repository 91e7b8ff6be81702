package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * PII detection/redaction for training-data curation: emails, IPv4
 * addresses, phone-like digit runs, and bare numbers, each as a count
 * and a placeholder substitution. Pure codegen'd regexp expressions —
 * map-side at any scale, no shuffle, no UDF.
 *
 * The patterns are deliberately restricted to syntax shared by Java
 * regex (Spark) and RE2 (DuckDB oracle): no lookaround, no backrefs —
 * both engines match them identically.
 */
object Pii {

  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  /** 7+ digits allowing separators, optional leading + — phone-shaped. */
  val PhonePattern = "\\+?\\d[\\d() -]{5,}\\d\\d"
  val NumberPattern = "\\d+"

  /** Ordered (pattern, placeholder) — most specific first, so an email
    * isn't later re-matched as a number etc. */
  val Rules: Seq[(String, String)] = Seq(
    EmailPattern -> "<EMAIL>",
    Ipv4Pattern -> "<IP>",
    PhonePattern -> "<PHONE>",
    NumberPattern -> "<NUM>")

  def countMatches(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0))).cast("long")

  /** Replace every rule's matches with its placeholder, in rule order. */
  def redact(text: Column): Column =
    Rules.foldLeft(text) { case (c, (p, repl)) => regexp_replace(c, p, repl) }
}
