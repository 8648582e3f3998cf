package graft

import graft.llm.Pii
import org.apache.spark.sql.functions._

/** PII scrub: detection counts, masking, idempotence. */
class PiiSpec extends SparkSpec {
  import spark.implicits._

  private def one(text: String): (Int, Int, Int, String) = {
    val r = Seq(text).toDF("t")
      .select(Pii.emailCount(col("t")).as("e"), Pii.phoneCount(col("t")).as("p"),
        Pii.ipCount(col("t")).as("i"), Pii.redact(col("t")).as("r"))
      .head()
    (r.getInt(0), r.getInt(1), r.getInt(2), r.getString(3))
  }

  test("detects and masks each kind") {
    val (e, p, i, r) = one("mail a.b+c@ex-1.org or call 555-010-1234 from 10.0.8.15 now")
    assert((e, p, i) === (1, 1, 1))
    assert(r === "mail <EMAIL> or call <PHONE> from <IP> now")
  }

  test("clean text is untouched") {
    val (e, p, i, r) = one("plain words only 123 4.5")
    assert((e, p, i) === (0, 0, 0))
    assert(r === "plain words only 123 4.5")
  }

  test("phone pattern does not eat IPv4 octets") {
    val (e, p, i, r) = one("host 192.168.100.200 up")
    assert((e, p, i) === (0, 0, 1))
    assert(r === "host <IP> up")
  }

  test("redaction is idempotent") {
    val once = one("x a@b.io y 555-010-0000 z 1.2.3.4")._4
    assert(one(once)._4 === once)
  }

  test("multiple occurrences all count and all mask") {
    val (e, p, i, r) = one("a@b.co c@d.co 1.2.3.4 5.6.7.8")
    assert((e, i) === (2, 2))
    assert(r === "<EMAIL> <EMAIL> <IP> <IP>")
  }
}
