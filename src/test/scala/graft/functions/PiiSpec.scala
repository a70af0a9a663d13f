package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions.col
import TextFunctions._

/** The PII redaction chain (q149): every typed pattern scrubbed, order
  * honored, look-alikes left alone.
  */
class PiiSpec extends SparkTestBase {
  import spark.implicits._

  private def redact(s: String): String =
    Seq(s).toDF("t").select(redactPii(col("t"))).as[String].head()

  private def count(s: String, p: String): Long =
    Seq(s).toDF("t").select(piiCount(col("t"), p)).as[Long].head()

  test("each PII type is redacted with its typed tag") {
    assert(redact("mail a.user+tag@sub.example.co.uk now") == "mail <EMAIL> now")
    assert(redact("host 192.168.001.254 up") == "host <IP> up")
    assert(redact("call +1-555-867-5309 today") == "call <PHONE> today")
    assert(redact("call (555) 867-5309 today") == "call <PHONE> today")
    assert(redact("acct 12345678 closed") == "acct <ID> closed")
  }

  test("look-alikes survive: short digit runs, spaced decimals, bare words") {
    assert(redact("v1.2 beta 1234567 x") == "v1.2 beta 1234567 x")
    assert(redact("pi 3.14 and 2.71") == "pi 3.14 and 2.71")
    assert(redact("user at example dot com") == "user at example dot com")
  }

  test("order: an email's digit-heavy local part never leaks as an <ID>") {
    // 8+ digits inside the address — email wins because it redacts first
    assert(redact("x 123456789@example.com y") == "x <EMAIL> y")
  }

  test("a 17+ digit run is out of the 8-16 id band on both engines") {
    assert(redact("n 12345678901234567 m") == "n 12345678901234567 m")
  }

  test("independent counts audit the original text") {
    val t = "a@b.io and c@d.io from 10.0.0.1 acct 987654321"
    assert(count(t, PiiEmailPattern) == 2L)
    assert(count(t, PiiIpv4Pattern) == 1L)
    assert(count(t, PiiIdPattern) == 1L)
    assert(count(t, PiiPhonePattern) == 0L)
  }
}
