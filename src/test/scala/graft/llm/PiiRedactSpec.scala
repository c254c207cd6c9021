package graft.llm

import java.security.MessageDigest

import graft.SparkSpec

/** Pins [[TextAnalysis.piiRedact]] replacement semantics on hand-built
  * DIRTY rows. The oracle entry appends [[TextAnalysis.PiiDirtySuffix]] to
  * the digit-free synthetic corpus so it certifies cross-engine agreement
  * on the match path; the exact counts / replacement text / pattern-order
  * behavior is asserted here. */
class PiiRedactSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def redact(rows: (Long, String)*): Seq[(Long, Long, Long, Long, Long, String)] =
    TextAnalysis.piiRedactOf(rows.toDF("doc_id", "text"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5)))
      .toSeq

  test("emails, IPs, and long numbers are counted and redacted") {
    val out = redact(
      1L -> "contact bob.smith+x@example.co.uk or 10.0.255.1 today",
      2L -> "card 4111111111111111 expires soon",
      3L -> "clean text with no pii at all")
    assert(out === Seq(
      (1L, 1L, 1L, 0L, 2L, md5hex("contact <EMAIL> or <IP> today")),
      (2L, 0L, 0L, 1L, 1L, md5hex("card <NUM> expires soon")),
      (3L, 0L, 0L, 0L, 0L, md5hex("clean text with no pii at all"))))
  }

  test("email pass runs first: dotted-digit local parts never half-match") {
    // 12.34.56.78@example.com must be ONE email, not an email plus an IP —
    // counts are on the original text (the ip pattern does match the raw
    // substring) but the redacted text shows the email pass won
    val out = redact(1L -> "mail 12.34.56.78@example.com now")
    val (_, nEmail, nIp, _, _, md5) = out.head
    assert(nEmail === 1L)
    assert(nIp === 1L) // count on original text: auditable, order-free
    assert(md5 === md5hex("mail <EMAIL> now"))
  }

  test("multiple matches per row and boundary anchoring") {
    val out = redact(
      1L -> "a@b.io c@d.io 1.2.3.4 5.6.7.8 1234567890123 12345678901234567890x")
    val (_, nEmail, nIp, nNum, nTotal, md5) = out.head
    assert(nEmail === 2L && nIp === 2L)
    // 13-digit run matches; the 20-digit run fails the \b{13,19}\b anchor
    assert(nNum === 1L)
    assert(nTotal === 5L)
    assert(md5 === md5hex("<EMAIL> <EMAIL> <IP> <IP> <NUM> 12345678901234567890x"))
  }

  test("PiiDirtySuffix contributes exactly one hit per pattern") {
    val out = redact(1L -> ("clean doc" + TextAnalysis.PiiDirtySuffix))
    assert(out === Seq(
      (1L, 1L, 1L, 1L, 3L,
        md5hex("clean doc contact <EMAIL> from <IP> card <NUM>"))))
  }
}
