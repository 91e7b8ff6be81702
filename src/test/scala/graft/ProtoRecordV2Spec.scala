package graft

import graft.sources.{ProtoRecordFile, ProtoRecordV2}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * The splittable DataSourceV2 record-file scan must hand out every
 * record exactly once across byte-range splits (CRC-validated resync at
 * boundaries), agree bit-for-bit with the sequential one-task-per-file
 * reader, and show its name pushdown + column pruning in the plan.
 */
class ProtoRecordV2Spec extends SparkSpec {

  /** Deterministic corpus: enough variably-sized records that small
    * splits put boundaries inside headers, payloads, and trailers. */
  private def corpus(seed: Int, n: Int): Seq[Array[Byte]] =
    (0 until n).map { i =>
      val name = s"/v2/m${i % 7}"
      val labels = if (i % 3 == 0) Map("host" -> s"h${i % 5}", "i" -> i.toString)
                   else Map("host" -> s"h${i % 5}")
      val vt = if (i % 2 == 0) "GAUGE" else "RATE"
      val nv = 1 + (i * 31 + seed) % 9
      val values = (0 until nv).map { j =>
        val ts = 1000L * (i * 10 + j)
        if (j % 5 == 4) (ts, None, Some(s"s$i-$j" * (1 + j % 3)), None)
        else (ts, Some(i + j / 100.0), None, if (j % 4 == 3) Some(ts + 500) else None)
      }
      ProtoRecordFile.encodeValueStream(name, labels, vt, values)
    }

  private def writeDir(files: Seq[Array[Byte]]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_v2").toString
    files.zipWithIndex.foreach { case (bytes, i) =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(f"$dir/datastore.$i%03d.bin"), bytes)
    }
    dir
  }

  private def sortedRows(df: DataFrame): Seq[String] =
    df.select(col("name"), map_entries(col("labels")).cast("string"),
        col("value_type"), col("ts"), col("dval"), col("sval"), col("end_ts"))
      .collect().map(_.toString).sorted.toSeq

  test("tiny splits agree with the sequential reader and actually split") {
    val dir = writeDir(Seq(
      ProtoRecordFile.frame(corpus(1, 60)),
      ProtoRecordFile.frame(corpus(2, 45)),
      ProtoRecordFile.frame(corpus(3, 1))))
    val legacy = ProtoRecordFile.read(spark, dir)
    // Split sizes chosen to land boundaries mid-header / mid-payload /
    // mid-trailer; 97 is prime so boundaries drift across frame phases.
    Seq(97L, 256L, 1000L).foreach { split =>
      val v2 = ProtoRecordV2.read(spark, dir, Some(split))
      assert(sortedRows(v2) == sortedRows(legacy), s"splitBytes=$split")
      assert(v2.rdd.getNumPartitions > 3,
        s"splitBytes=$split should produce more partitions than files")
    }
    // Default split (maxPartitionBytes) also agrees.
    assert(sortedRows(ProtoRecordV2.read(spark, dir)) == sortedRows(legacy))
  }

  test("name filter is pushed, fully handled, and visible in the plan") {
    val dir = writeDir(Seq(ProtoRecordFile.frame(corpus(4, 50))))
    val legacy = ProtoRecordFile.read(spark, dir).where(col("name") === "/v2/m3")
    val v2 = ProtoRecordV2.read(spark, dir, Some(512)).where(col("name") === "/v2/m3")
    assert(sortedRows(v2) == sortedRows(legacy))
    assert(legacy.count() > 0, "fixture must exercise the filter")
    val plan = v2.queryExecution.executedPlan.toString
    assert(plan.contains("EqualTo(name,/v2/m3)"),
      s"pushed name filter must appear in the scan description:\n$plan")
    // Fully handled: no residual Filter node re-checking name above the scan.
    assert(!plan.contains("Filter (name"),
      s"name equality must not be re-evaluated post-scan:\n$plan")
    // Prefix pushdown too.
    val pre = ProtoRecordV2.read(spark, dir, Some(512))
      .where(col("name").startsWith("/v2/m"))
    assert(pre.count() == ProtoRecordFile.read(spark, dir).count())
    assert(pre.queryExecution.executedPlan.toString.contains("StringStartsWith(name,/v2/m"))
  }

  test("column pruning reaches the scan; count(*) decodes no columns") {
    val dir = writeDir(Seq(ProtoRecordFile.frame(corpus(5, 30))))
    val names = ProtoRecordV2.read(spark, dir, Some(512)).select("name")
    val plan = names.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: name,") || plan.contains("ReadSchema: name"),
      s"pruned read schema must reach the scan:\n$plan")
    assert(names.distinct().count() == 7)
    assert(ProtoRecordV2.read(spark, dir, Some(512)).count() ==
      ProtoRecordFile.read(spark, dir).count())
  }

  test("corruption mid-file: both readers resync and agree on the rest") {
    val clean = ProtoRecordFile.frame(corpus(6, 40))
    val recs = ProtoRecordFile.records(clean).toSeq // (payloadOff, len)
    val corrupted = clean.clone()
    // Record 12: garble the payload interior. Framing (size, trailer
    // position) is untouched, so both readers frame it, fail the proto
    // decode, skip it, and chain on identically.
    val (o12, n12) = recs(12)
    (0 until math.min(8, n12)).foreach(i => corrupted(o12 + i) = 0x5A.toByte)
    // Record 25: flip its CRC trailer only. Both readers tolerate a
    // bad CRC (Go semantics) — including a v2 split whose boundary
    // resync lands exactly on this record (chain-validated accept).
    val (o25, n25) = recs(25)
    corrupted(o25 + n25) = (corrupted(o25 + n25) ^ 0xFF).toByte
    val dir = writeDir(Seq(corrupted))
    val legacy = ProtoRecordFile.read(spark, dir)
    // 128-byte splits guarantee boundaries inside and around both
    // corrupted records.
    val v2 = ProtoRecordV2.read(spark, dir, Some(128))
    assert(sortedRows(v2) == sortedRows(legacy))
    assert(legacy.count() > 0)
    // The bad-CRC record's rows survive; the garbled record's are gone.
    val names = legacy.select("name").distinct().collect().map(_.getString(0)).toSet
    assert(names.contains("/v2/m" + (25 % 7)))
  }

  test("peekName matches the full decode on every record") {
    val payloads = corpus(7, 25)
    payloads.foreach { p =>
      val peek = ProtoRecordV2.peekName(p, 0, p.length)
      val full = ProtoRecordFile.decodeValueStream(p, 0, p.length).name
      assert(peek == full)
    }
  }

  test("fuzz: any split size partitions any clean corpus exactly once") {
    import graft.sources.{ProtoRecordInputPartition, ProtoRecordPartitionReader}
    import org.apache.spark.sql.types.StructType
    val rnd = new scala.util.Random(23)
    // drive the partition readers directly (no Spark jobs): the
    // exactly-once contract must hold for EVERY split size, including
    // degenerate 1-byte splits that put a boundary at every offset
    def readAll(file: String, len: Long, splitBytes: Long): Seq[String] =
      (0L until len by splitBytes).flatMap { s =>
        val part = ProtoRecordInputPartition(
          file, s, math.min(s + splitBytes, len), len)
        val r = new ProtoRecordPartitionReader(part, graft.model.Point.schema,
          Array.empty, spark.sessionState.newHadoopConf())
        val out = scala.collection.mutable.ArrayBuffer[String]()
        try while (r.next()) {
          val row = r.get()
          out += s"${row.getUTF8String(0)}|${row.getLong(3)}|" +
            s"${if (row.isNullAt(4)) "-" else row.getDouble(4)}"
        } finally r.close()
        out
      }
    (0 until 30).foreach { trial =>
      val n = rnd.nextInt(25) + 1
      val bytes = ProtoRecordFile.frame((0 until n).map { i =>
        ProtoRecordFile.encodeValueStream(s"/f/$trial/$i",
          if (rnd.nextBoolean()) Map("k" -> s"v${rnd.nextInt(4)}") else Map.empty,
          "GAUGE",
          (0 to rnd.nextInt(6)).map(j =>
            (j * 1000L, Some(rnd.nextDouble()), None, None)))
      })
      val dir = java.nio.file.Files.createTempDirectory("graft_v2f")
      val f = dir.resolve("r.bin")
      java.nio.file.Files.write(f, bytes)
      val sequential = ProtoRecordFile.records(bytes).toSeq.flatMap {
        case (off, sz) =>
          val d = ProtoRecordFile.decodeValueStream(bytes, off, sz)
          d.values.map(v => s"/f/$trial/${d.name.split('/').last}|${v._1}|" +
            s"${v._2.getOrElse("-")}")
      }.sorted
      Seq(1L, rnd.nextInt(40) + 2L, rnd.nextInt(400) + 50L, bytes.length + 1L)
        .foreach { split =>
          val got = readAll(f.toString, bytes.length.toLong, split).sorted
          assert(got == sequential, s"trial=$trial splitBytes=$split")
        }
      // corrupted image: readers must never throw, whatever they salvage
      val bad = bytes.clone()
      (0 until rnd.nextInt(20) + 1).foreach { _ =>
        bad(rnd.nextInt(bad.length)) = rnd.nextInt(256).toByte
      }
      java.nio.file.Files.write(f, bad)
      readAll(f.toString, bad.length.toLong, rnd.nextInt(60) + 1L)
    }
  }

  test("distributed write: export -> re-read roundtrips; every frame CRC-valid") {
    val dir = writeDir(Seq(ProtoRecordFile.frame(corpus(9, 40))))
    val df = ProtoRecordFile.read(spark, dir)
    val out = java.nio.file.Files.createTempDirectory("graft_v2w").toString + "/exp"
    ProtoRecordV2.write(df.repartition(3), out)
    // one record file per task, all framed + CRC-valid
    val files = new java.io.File(out).listFiles().filter(_.getName.endsWith(".rec"))
    assert(files.length == 3, s"expected one file per task, got ${files.length}")
    assert(!new java.io.File(out).listFiles().exists(_.getName.endsWith(".tmp")),
      "commit must rename away every temp file")
    files.foreach { f =>
      val bytes = java.nio.file.Files.readAllBytes(f.toPath)
      val recs = ProtoRecordFile.records(bytes).toSeq
      assert(recs.nonEmpty)
      recs.foreach { case (off, len) =>
        val crc = ProtoRecordFile.crc16(bytes, off, len)
        val stored = (bytes(off + len) & 0xFF) | ((bytes(off + len + 1) & 0xFF) << 8)
        assert(crc == stored, s"${f.getName}: CRC mismatch at $off")
      }
    }
    // both readers agree with the original points
    assert(sortedRows(ProtoRecordV2.read(spark, out, Some(256))) == sortedRows(df))
    assert(sortedRows(ProtoRecordFile.read(spark, out)) == sortedRows(df))
  }

  test("writer flush cap bounds memory: many series, tiny flush threshold") {
    import graft.sources.{ProtoRecordCommit, ProtoRecordDataWriter}
    val dir = java.nio.file.Files.createTempDirectory("graft_v2w2").toString
    val w = new ProtoRecordDataWriter(dir, 0, 7L, flushValues = 4)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(graft.model.Point.schema)
    val toInternal = org.apache.spark.sql.catalyst.encoders.ExpressionEncoder(enc)
      .createSerializer()
    (0 until 200).foreach { i =>
      val r = org.apache.spark.sql.Row(s"/w/${i % 37}", Map("i" -> (i % 5).toString),
        "GAUGE", i.toLong, i / 10.0, null, null)
      w.write(toInternal(r).copy())
    }
    val msg = w.commit().asInstanceOf[ProtoRecordCommit]
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(new org.apache.hadoop.conf.Configuration())
    assert(fs.rename(new org.apache.hadoop.fs.Path(msg.tmpFile),
      new org.apache.hadoop.fs.Path(msg.finalFile)))
    val back = ProtoRecordV2.read(spark, dir)
    assert(back.count() == 200)
    assert(back.select("name").distinct().count() == 37)
  }

  test("reported statistics carry total file size for the optimizer") {
    val bytes = ProtoRecordFile.frame(corpus(8, 20))
    val dir = writeDir(Seq(bytes))
    val files = ProtoRecordV2.listFiles(spark, dir)
    assert(files.map(_._2).sum == bytes.length.toLong)
  }
}
