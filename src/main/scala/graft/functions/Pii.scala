package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared PII patterns for the redaction surfaces (batch audit q111 and
  * the streaming in-flight scrub) — one definition so the stream twin
  * provably applies the same rules as the audited batch pass.
  *
  * Counting uses the ORIGINAL payload per pattern (documented q111
  * semantics: an IP's octets also count as digit runs); scrubbing
  * applies email → IP → digit-run in that order. Spark regexp_replace
  * is global by default; the DuckDB oracle needs the explicit 'g'.
  */
object Pii {
  val NumRe = "[0-9]+"
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val IpRe = "([0-9]{1,3}\\.){3}[0-9]{1,3}"

  def numHits(c: Column): Column =
    size(regexp_extract_all(c, lit(NumRe), lit(0))).cast("long")
  def emailHits(c: Column): Column =
    size(regexp_extract_all(c, lit(EmailRe), lit(0))).cast("long")
  def ipHits(c: Column): Column =
    size(regexp_extract_all(c, lit(IpRe), lit(0))).cast("long")

  /** The scrubbed payload: email → IP → digit-run replacement chain. */
  def scrub(c: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(c,
      EmailRe, "<EMAIL>"), IpRe, "<IP>"), NumRe, "<NUM>")
}
