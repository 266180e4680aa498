package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class RedactionSpec extends SparkSpec {
  import spark.implicits._

  private def scrub(s: String): String =
    Seq(s).toDF("t").select(Redaction.redact(col("t")).as("r"))
      .collect().head.getString(0)

  test("redacts emails, phones, and IPv4 with correct boundaries") {
    assert(scrub("mail a.b+c@x-corp.co.uk now") === "mail <EMAIL> now")
    assert(scrub("call 555-867-5309 or 555.867.5309") ===
      "call <PHONE> or <PHONE>")
    assert(scrub("host 192.168.0.1 up") === "host <IP> up")
    assert(scrub("clean text stays clean") === "clean text stays clean")
  }

  test("pattern order: email digits are not half-eaten by phone/ip") {
    // an address whose local part looks phone-shaped must redact as
    // ONE email, not a phone inside a mangled string
    assert(scrub("x 555-123-4567@mail.example.org y") === "x <EMAIL> y")
    // a dotted-quad alone is an IP, not a phone (phone needs 3-3-4)
    assert(scrub("10.0.123.255") === "<IP>")
  }

  test("matchCount agrees with the number of redactions") {
    val df = Seq("a@b.co and c@d.org, call 555-123-4567").toDF("t")
    val r = df.select(
      Redaction.matchCount(col("t"), Redaction.patterns.head._2).as("em"),
      Redaction.matchCount(col("t"), Redaction.patterns(1)._2).as("ph"),
      Redaction.matchCount(col("t"), Redaction.patterns(2)._2).as("ip"))
      .collect().head
    assert(r.getLong(0) === 2L && r.getLong(1) === 1L && r.getLong(2) === 0L)
  }
}
