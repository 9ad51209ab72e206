package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** T8 PII redaction, checked against a fully independent driver-side
  * implementation (Java regex + MessageDigest, no Spark expressions):
  * injection, per-class counts, redaction order, and the md5 of the
  * final redacted text.
  */
class PiiRedactSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private val Email = "[a-z0-9]+@[a-z]+[.][a-z]+"
  private val Ip = "[0-9]+[.][0-9]+[.][0-9]+[.][0-9]+"
  private val Phone = "[0-9]{3}-[0-9]{4}"

  private def inject(id: Long, text: String): String =
    if (id % 3 == 0)
      s"$text contact user$id@example.com from 192.168.${id % 100}.7"
    else if (id % 3 == 1)
      f"$text call 555-${(id * 7) % 10000}%04d today"
    else
      s"$text host 10.${id % 256}.0.${id % 7} up"

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("piiRedact matches an independent driver-side redaction, md5 included") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = docs.map { case (id, text) =>
      val t0 = inject(id, text)
      val nEmail = Email.r.findAllIn(t0).length
      val t1 = t0.replaceAll(Email, "<EMAIL>")
      val nIp = Ip.r.findAllIn(t1).length
      val t2 = t1.replaceAll(Ip, "<IP>")
      val nPhone = Phone.r.findAllIn(t2).length
      val t3 = t2.replaceAll(Phone, "<PHONE>")
      (id, nEmail, nPhone, nIp, t3.length, md5hex(t3))
    }.toSet

    val got = graft.operators.TextAnalysis.piiRedact(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getInt(4), r.getString(5))).toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("every injection class is found exactly once and fully scrubbed") {
    val rows = graft.operators.TextAnalysis.piiRedact(spark, dir).collect()
    rows.foreach { r =>
      val (id, e, p, ip) = (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3))
      if (id % 3 == 0) assert(e == 1 && ip == 1 && p == 0, s"doc $id: ($e,$p,$ip)")
      else if (id % 3 == 1) assert(e == 0 && ip == 0 && p == 1, s"doc $id: ($e,$p,$ip)")
      else assert(e == 0 && ip == 1 && p == 0, s"doc $id: ($e,$p,$ip)")
    }
    // the fixture vocabulary itself contains no PII — every hit above is
    // an injected span, so redaction removed ALL of them
    assert(rows.length > 0)
  }
}
