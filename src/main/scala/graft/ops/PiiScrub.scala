package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII scrubbing for web-corpus text — the standard pre-training
  * redaction pass (emails / IPv4 / international phone numbers →
  * typed placeholders). The reference applies the same policy to its
  * own high-risk span types (PAN masking — reference
  * `ocr_service/modules/document_intelligence.py:329` `_mask_number`,
  * `personal_doc_extractor.py:319` `_mask_pan`; see
  * [[graft.text.CardIntel]] for that port); this operator extends the
  * policy to the generic identifier classes every crawl corpus carries.
  *
  * Patterns are deliberately ASCII-explicit (`[0-9]`, spelled-out
  * character classes, no Unicode-dependent shorthands) so the SAME
  * regex text means the same thing in Java's engine and in RE2-style
  * engines — which is what lets the oracle recompute the scrub
  * verbatim. Replacement order is fixed (email → ipv4 → phone) and
  * matters: an email's domain may contain digit runs a later pattern
  * could otherwise clip.
  *
  * Scale shape: narrow per-row map — three codegen'd regexp_replace /
  * regexp_count expressions, no shuffle, no UDF.
  */
object PiiScrub {

  /** ASCII email (practical form, not full RFC 5322). */
  val EmailPattern: String =
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+"

  /** Dotted-quad IPv4 (unanchored octet bound — redaction favors
    * recall; a 999.* false positive scrubs a non-address, which is the
    * safe direction). */
  val Ipv4Pattern: String =
    "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  /** International phone: '+' then 7-15 digits (E.164 length bounds),
    * the only phone shape with a cross-locale precision worth a
    * corpus-wide default. */
  val PhonePattern: String = "\\+[0-9]{7,15}"

  val EmailToken = "<EMAIL>"
  val IpToken = "<IP>"
  val PhoneToken = "<PHONE>"

  /** Scrubbed text column (email → ipv4 → phone, all occurrences). */
  def scrub(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, EmailToken),
        Ipv4Pattern, IpToken),
      PhonePattern, PhoneToken)

  /** (idCol, n_emails, n_ips, n_phones, scrub_md5) per document —
    * counts are pre-scrub leftmost-non-overlapping match counts,
    * scrub_md5 fingerprints the redacted text (the oracle-comparable
    * shape: md5 avoids shipping scrubbed text through the compare). */
  def stats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    docs.select(col(idCol),
      regexp_count(t, lit(EmailPattern)).cast("long").as("n_emails"),
      regexp_count(regexp_replace(t, EmailPattern, EmailToken),
        lit(Ipv4Pattern)).cast("long").as("n_ips"),
      regexp_count(
        regexp_replace(regexp_replace(t, EmailPattern, EmailToken),
          Ipv4Pattern, IpToken),
        lit(PhonePattern)).cast("long").as("n_phones"),
      md5(scrub(t)).as("scrub_md5"))
  }

  /** Input rows with `textCol` replaced by its scrubbed form. */
  def apply(docs: DataFrame, textCol: String): DataFrame =
    docs.withColumn(textCol, scrub(col(textCol)))
}
