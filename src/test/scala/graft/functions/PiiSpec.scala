package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** PII redaction: every pass masks its pattern, pass order prevents
  * double-counting, and redaction is idempotent.
  */
class PiiSpec extends SparkSpec {
  import spark.implicits._

  private def redactOne(s: String): String =
    Seq(s).toDF("t").select(Pii.redact(col("t"))).as[String].head()

  private def countsOne(s: String): Map[String, Int] = {
    val cs = Pii.counts(col("t"))
    val row = Seq(s).toDF("t")
      .select(cs.map { case (n, c) => c.as(n) }: _*).head()
    cs.map(_._1).zipWithIndex.map { case (n, i) => n -> row.getInt(i) }.toMap
  }

  test("each pattern class is masked with its own token") {
    val out = redactOne(
      "mail a.b+c@sub.example.org ip 192.168.0.1 call 555-123-4567 id 900123")
    assert(out ===
      "mail <EMAIL> ip <IP> call <PHONE> id <NUM>")
  }

  test("specificity order: IP octets and phone digits are not bare numbers") {
    val c = countsOne("ping 10.0.0.1 then 555-000-1111 then 42")
    assert(c("email") === 0)
    assert(c("ip") === 1)
    assert(c("phone") === 1)
    assert(c("num") === 1) // only the 42
  }

  test("email local parts with dots and digits stay one match") {
    val c = countsOne("customer.000000042@ex7.com wrote")
    assert(c("email") === 1)
    assert(c("num") === 0)
  }

  test("redaction is idempotent") {
    val once = redactOne("a@b.co 1.2.3.4 555-111-2222 77")
    assert(redactOne(once) === once)
  }

  test("digit-free text passes through unchanged") {
    val s = "plain words only no contact data here"
    assert(redactOne(s) === s)
    assert(countsOne(s).values.sum === 0)
  }
}
