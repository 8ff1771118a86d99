package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.Present.PresentOps

/** PII redaction over the `documents` table — the compliance pass every
  * training-data pipeline runs before a corpus leaves quarantine (no
  * reference-repo counterpart: the reference's text handling stops at
  * JSON codecs, SURVEY.md §2.C).
  *
  * Pure per-row `regexp_replace` / `regexp_extract_all` Catalyst
  * expressions — no UDFs, no shuffle, whole-stage codegen'd, so the scan
  * streams at full split parallelism at 100 TB exactly like
  * [[Text.textStats]]. The patterns are deliberately written in the
  * RE2-compatible subset of Java regex (character classes, bounded
  * repetition, `\b`) so the SAME pattern strings run on the DuckDB
  * oracle — and, in production, on any RE2-based scrubber sitting next
  * to the lake.
  *
  * The synthetic corpus contains no PII, so the gate query INJECTS a
  * deterministic email / phone / IPv4 per document (derived from
  * `doc_id`, identically spelled in the oracle SQL) and then proves the
  * redactor strips all three: the match counts come from the pre-image,
  * the digest from the post-image, and PipelineOpsSpec pins
  * idempotence (redacting twice == redacting once) plus zero residual
  * matches after one pass.
  */
object Privacy {

  /** RE2-and-Java-compatible patterns. Order-independent: the three
    * pattern families cannot overlap (an email's local part never
    * contains `@`-free phone/IP shapes that survive the email match). */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "\\+1-[0-9]{3}-[0-9]{4}"
  val Ipv4Pattern  = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"

  /** Redact all three PII families in `text`, innermost-first so later
    * passes see the earlier placeholders (which contain no redactable
    * shapes). */
  def redact(text: Column): Column = {
    val noEmail = regexp_replace(text, EmailPattern, "<EMAIL>")
    val noPhone = regexp_replace(noEmail, PhonePattern, "<PHONE>")
    regexp_replace(noPhone, Ipv4Pattern, "<IP>")
  }

  private def countMatches(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0))).cast(LongType)

  /** Gate query: inject deterministic PII, count each family in the
    * pre-image, emit the md5 of the redacted post-image (compact,
    * hash-comparable stand-in for the full redacted text). */
  def piiRedact(spark: SparkSession, dir: String): DataFrame = {
    val injected = concat(
      col("text"),
      lit(" contact user"), col("doc_id").cast(StringType),
      lit("@mail.example.com or +1-555-"),
      lpad((col("doc_id") % 10000).cast(StringType), 4, "0"),
      lit(" from 10."), (col("doc_id") % 256).cast(StringType), lit(".0.7"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), injected.as("txt"))
      .select(
        col("doc_id"),
        countMatches(col("txt"), EmailPattern).as("n_emails"),
        countMatches(col("txt"), PhonePattern).as("n_phones"),
        countMatches(col("txt"), Ipv4Pattern).as("n_ips"),
        md5(redact(col("txt"))).as("redacted_md5"))
      .presentSorted(col("doc_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pii_redact" -> piiRedact _)

  val oracles: Map[String, String] = Map(
    "pii_redact" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    text || ' contact user' || doc_id || '@mail.example.com or +1-555-'
        |         || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        |         || ' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.7'
        |      AS txt
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(txt,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
        |    AS n_emails,
        |  CAST(len(regexp_extract_all(txt,
        |    '\+1-[0-9]{3}-[0-9]{4}')) AS BIGINT) AS n_phones,
        |  CAST(len(regexp_extract_all(txt,
        |    '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b')) AS BIGINT) AS n_ips,
        |  md5(regexp_replace(regexp_replace(regexp_replace(txt,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\+1-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g'),
        |    '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b', '<IP>', 'g'))
        |    AS redacted_md5
        |FROM t ORDER BY doc_id""".stripMargin)
}
