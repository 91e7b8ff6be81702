package graft

import graft.text.Pii
import org.apache.spark.sql.functions._

class PiiSpec extends SparkSpec {
  import spark.implicits._

  private def one(text: String): (Long, Long, Long, Long, String) = {
    val r = Seq(text).toDF("t").select(
      Pii.countMatches(col("t"), Pii.EmailPattern),
      Pii.countMatches(col("t"), Pii.Ipv4Pattern),
      Pii.countMatches(col("t"), Pii.PhonePattern),
      Pii.countMatches(col("t"), Pii.NumberPattern),
      Pii.redact(col("t"))).collect()(0)
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))
  }

  test("email detected and redacted first") {
    val (e, _, _, _, red) = one("contact bob.smith+x@example.co.uk today")
    assert(e === 1L)
    assert(red === "contact <EMAIL> today")
  }

  test("ipv4 detected; digits inside don't leak as numbers after redaction") {
    val (_, ip, _, _, red) = one("from 192.168.0.1 port")
    assert(ip === 1L)
    assert(red === "from <IP> port")
  }

  test("phone-shaped digit runs") {
    val (_, _, ph, _, red) = one("call +1 555 867 5309 now")
    assert(ph === 1L)
    assert(red === "call <PHONE> now")
  }

  test("bare numbers redact last; short digit runs are not phones") {
    val (e, ip, ph, n, red) = one("""{"k": 69}""")
    assert((e, ip, ph) === (0L, 0L, 0L))
    assert(n === 1L)
    assert(red === """{"k": <NUM>}""")
  }

  test("mixed document") {
    val (e, ip, ph, n, red) =
      one("a@b.io and c@d.org at 10.0.0.1, call 5558675309, room 7")
    assert(e === 2L && ip === 1L && ph === 1L)
    assert(n >= 1L) // raw-text count includes digits of ip/phone by design
    assert(red === "<EMAIL> and <EMAIL> at <IP>, call <PHONE>, room <NUM>")
  }
}
