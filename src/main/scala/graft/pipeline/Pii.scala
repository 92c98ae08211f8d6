package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII redaction for pretraining corpora: detect and scrub emails, IPv4
  * addresses, and phone numbers — the standard pre-release scrub pass
  * (emails/IPs/phones are the canonical public-corpus redaction targets).
  *
  * Everything is `regexp_replace`/`regexp_count` over codegen'd Columns —
  * per-row, zero shuffle, runs inside the scan stage at any scale. The
  * patterns avoid constructs whose semantics differ between regex
  * engines (no backrefs, no lookaround), so a SQL oracle replays them
  * verbatim.
  *
  * Scrub ORDER is part of the contract: email → IPv4 → phone. An IPv4
  * address is also a syntactically valid phone match (digits + dots), so
  * phones are counted and scrubbed only AFTER IPs are gone; each
  * pattern's count is defined as its matches in the text the previous
  * scrubs produced.
  */
object Pii {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b(\\d{1,3}\\.){3}\\d{1,3}\\b"
  /** International-ish phone: leading digit or +, then >=7 digits/
    * separators, ending in a digit. */
  val PhoneRe = "\\+?\\d[\\d() .-]{7,}\\d"

  def scrubEmails(text: Column): Column = regexp_replace(text, EmailRe, "<EMAIL>")
  def scrubIps(text: Column): Column = regexp_replace(text, Ipv4Re, "<IP>")
  def scrubPhones(text: Column): Column = regexp_replace(text, PhoneRe, "<PHONE>")

  /** Per-doc PII counts + the fully scrubbed text. Counts follow the
    * scrub order (each pattern counted on the previous stage's output). */
  def withScrub(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val noEmail = scrubEmails(col(textCol))
    val noIp = scrubIps(noEmail)
    docs.withColumns(Map(
      "n_emails" -> regexp_count(col(textCol), lit(EmailRe)),
      "n_ips" -> regexp_count(noEmail, lit(Ipv4Re)),
      "n_phones" -> regexp_count(noIp, lit(PhoneRe)),
      s"${textCol}_scrubbed" -> scrubPhones(noIp)))
  }

  /** Deterministic PII synthesis for the registered demo query (the
    * synthetic corpus contains no PII, which would verify nothing): a
    * pure function of (doc_id, text), replayed verbatim by the SQL
    * oracle — every 5th doc gains an email, every 7th an IPv4, every
    * 11th a phone number, so docs carry 0–3 findings in all
    * combinations. */
  def demoPii(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val id = col(idCol)
    docs.withColumn(textCol, concat(col(textCol),
      when(id % 5 === 0, concat(lit(" reach user"), id, lit("@example.com soon"))).otherwise(lit("")),
      when(id % 7 === 0, concat(lit(" from host "), id % 224, lit(".0.113.9 today"))).otherwise(lit("")),
      when(id % 11 === 0, concat(lit(" or call +1 (555) 01"), lpad((id % 100).cast("string"), 2, "0"), lit("-4567 now"))).otherwise(lit(""))))
  }
}
