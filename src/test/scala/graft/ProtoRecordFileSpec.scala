package graft

import graft.sources.ProtoRecordFile

class ProtoRecordFileSpec extends SparkSpec {

  private val stream1 = ("/proto/a", Map("host" -> "h1", "job" -> "j"),
    "GAUGE", Seq(
      (1000L, Some(1.5), None, None),
      (2000L, Some(1.5), None, Some(5000L)),          // RLE run
      (6000L, None, Some("state=up"), None)))          // string value
  private val stream2 = ("/proto/b", Map.empty[String, String], "RATE",
    Seq((1500L, Some(-2.25), None, None)))

  private def encodeAll(): Array[Byte] =
    ProtoRecordFile.frame(Seq(stream1, stream2).map {
      case (n, l, t, vs) => ProtoRecordFile.encodeValueStream(n, l, t, vs)
    })

  test("encode -> frame -> records -> decode round-trip") {
    val buf = encodeAll()
    val recs = ProtoRecordFile.records(buf).toSeq
    assert(recs.size == 2)
    val d1 = ProtoRecordFile.decodeValueStream(buf, recs.head._1, recs.head._2)
    assert(d1.name == "/proto/a")
    assert(d1.labels == Map("host" -> "h1", "job" -> "j"))
    assert(d1.valueType == "GAUGE")
    assert(d1.values == stream1._4)
    val d2 = ProtoRecordFile.decodeValueStream(buf, recs(1)._1, recs(1)._2)
    assert(d2.name == "/proto/b")
    assert(d2.values.head._2.contains(-2.25))
  }

  test("reader re-syncs past corruption (FindNextHeader semantics)") {
    val buf = encodeAll()
    // corrupt the first record body: decoder should still find record 2
    val corrupted = buf.clone()
    corrupted(7) = 0x7F.toByte // inside record 1's length/body region
    val junk = Array.fill[Byte](5)(0x33) ++ corrupted
    val recs = ProtoRecordFile.records(junk).toSeq
    assert(recs.nonEmpty)
    val names = recs.map(r =>
      try ProtoRecordFile.decodeValueStream(junk, r._1, r._2).name
      catch { case _: Throwable => "?" })
    assert(names.contains("/proto/b"))
  }

  test("crc16 matches CRC-16/ARC known vector") {
    // standard check value: crc16/ARC("123456789") = 0xBB3D
    val b = "123456789".getBytes("ASCII")
    assert(ProtoRecordFile.crc16(b, 0, b.length) == 0xBB3D)
  }

  test("Spark read: record files -> canonical point DataFrame") {
    val dir = java.nio.file.Files.createTempDirectory("graft_proto").toString
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/datastore.1.bin"), encodeAll())
    val df = ProtoRecordFile.read(spark, dir)
    assert(df.count() == 4)
    val byName = df.collect().groupBy(_.getString(0))
    assert(byName("/proto/a").length == 3)
    val rle = byName("/proto/a").find(!_.isNullAt(6)).get
    assert(rle.getLong(6) == 5000L)
    val sval = byName("/proto/a").find(!_.isNullAt(5)).get
    assert(sval.getString(5) == "state=up")
  }
}
