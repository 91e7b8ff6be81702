package graft

import graft.api.{Engine, Requests}
import graft.multimodal.Multimodal
import graft.operators.Aggregations
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class EngineSpec extends SparkSpec {

  private def twoSeries() = {
    import spark.implicits._
    Seq(
      ("/sys/cpu", "a", 1000L, 1.0), ("/sys/cpu", "a", 2000L, 3.0),
      ("/sys/cpu", "a", 3000L, 6.0),
      ("/sys/cpu", "b", 1000L, 2.0), ("/sys/cpu", "b", 2000L, 2.0),
      ("/sys/mem", "a", 1000L, 9.0))
      .toDF("name", "host", "ts", "dval")
      .select(col("name"), map(lit("host"), col("host")).as("labels"),
        lit("GAUGE").as("value_type"), col("ts"), col("dval"),
        lit(null).cast("string").as("sval"), lit(null).cast("long").as("end_ts"))
  }

  test("get: pattern + range filter + rate mutation pipeline") {
    val out = Engine.get(twoSeries(), Requests.GetRequest(
      variable = "/sys/cpu{host=a}",
      mutations = Seq(Requests.RateSigned(perSecond = true))))
    val vals = out.select("ts", "dval").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
    assert(vals == Seq((2000L, 2.0), (3000L, 3.0)))
  }

  test("get: aggregation after grid mutation re-derives grouping columns") {
    val out = Engine.get(twoSeries(), Requests.GetRequest(
      variable = "/sys/*",
      mutations = Seq(Requests.Mean(10000L)),
      aggregations = Seq(Requests.AggregationSpec(Aggregations.Sum, Nil, 10000L))))
    val byName = out.collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    // cpu: mean(a)= (1+3+6)/3 = 10/3; mean(b)=2 -> sum = 16/3; mem: 9
    assert(math.abs(byName("/sys/cpu") - (10.0 / 3 + 2.0)) < 1e-9)
    assert(byName("/sys/mem") == 9.0)
  }

  test("get: holt and sliding mutations chain through the request pipeline") {
    // holt on a constant series is the identity (level fixed point), so
    // the chained sliding window must see the raw values
    val out = Engine.get(twoSeries(), Requests.GetRequest(
      variable = "/sys/cpu{host=b}",
      mutations = Seq(Requests.Holt(1000L, 3000L),
        Requests.Sliding(2000L, 1000L, Aggregations.Max))))
    val vals = out.select("ts", "dval").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
    // host=b points: (1000, 2.0), (2000, 2.0) -> holt keeps 2.0; sliding
    // max (width 2s, hop 1s) emits at observed buckets 1000, 2000
    assert(vals == Seq((1000L, 2.0), (2000L, 2.0)))
  }

  test("get: autoRate rates only RATE-tagged series") {
    import spark.implicits._
    val mixed = Seq(
      ("/sys/reqs", "RATE", 1000L, 10.0), ("/sys/reqs", "RATE", 2000L, 30.0),
      ("/sys/reqs", "RATE", 3000L, 60.0),
      ("/sys/temp", "GAUGE", 1000L, 21.5), ("/sys/temp", "GAUGE", 2000L, 22.0))
      .toDF("name", "value_type", "ts", "dval")
      .select(col("name"), map(lit("h"), lit("x")).as("labels"),
        col("value_type"), col("ts"), col("dval"),
        lit(null).cast("string").as("sval"), lit(null).cast("long").as("end_ts"))
    val out = Engine.get(mixed, Requests.GetRequest(
      variable = "/sys/*", autoRate = true))
    val got = out.select("name", "ts", "dval").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == Set(
      ("/sys/reqs", 2000L, 20.0), ("/sys/reqs", 3000L, 30.0), // rated
      ("/sys/temp", 1000L, 21.5), ("/sys/temp", 2000L, 22.0))) // raw
  }

  test("get: chainMutations=false applies each mutation to the raw stream") {
    // C++ semantics (server/store.cc:140-147): one output stream per
    // mutation, each computed from the raw data — not a pipeline.
    val out = Engine.get(twoSeries(), Requests.GetRequest(
      variable = "/sys/cpu{host=a}",
      mutations = Seq(Requests.Mean(10000L), Requests.MaxM(10000L)),
      chainMutations = false))
    val vals = out.select("dval").collect().map(_.getDouble(0)).sorted.toSeq
    // mean(1,3,6) = 10/3 and max(1,3,6) = 6 — max over RAW, not over mean
    assert(vals == Seq(10.0 / 3, 6.0))
  }

  test("get: max_values caps per (series, mutation) under independent mode") {
    val out = Engine.get(twoSeries(), Requests.GetRequest(
      variable = "/sys/cpu{host=a}",
      mutations = Seq(Requests.Mean(1000L), Requests.MaxM(1000L)),
      chainMutations = false, maxValues = Some(2)))
    // 3 buckets per mutation; the tail-2 keeps 2 rows PER mutation
    // stream (4 total), not 2 rows across the combined union
    val byMut = out.groupBy("mut_idx").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(byMut == Map(0 -> 2L, 1 -> 2L))
  }

  test("get: repeated aggregations append both output stream sets") {
    // C++ semantics (server/store.cc:164-252): each StreamAggregation in
    // the request produces its own output streams over the same input.
    val out = Engine.get(twoSeries(), Requests.GetRequest(
      variable = "/sys/*",
      aggregations = Seq(
        Requests.AggregationSpec(Aggregations.Sum, Nil, 10000L),
        Requests.AggregationSpec(Aggregations.Max, Seq("host"), 10000L))))
    val rows = out.collect().map { r =>
      val usr = Option(r.getAs[Map[String, String]]("labels"))
        .flatMap(_.get("host")).orNull
      (r.getAs[String]("name"), usr, r.getAs[Double]("dval"))
    }.toSet
    assert(rows == Set(
      ("/sys/cpu", null, 14.0), ("/sys/mem", null, 9.0),   // SUM by name
      ("/sys/cpu", "a", 6.0), ("/sys/cpu", "b", 2.0),      // MAX by host
      ("/sys/mem", "a", 9.0)))
  }

  test("get: sample_interval 0 falls back to the 30 s reference default") {
    // server/store.cc:165-167: `if (!sample_interval) sample_interval
    // = 30000` — zero means "unset", not "zero-width buckets".
    assert(Requests.AggregationSpec(Aggregations.Sum, Nil, 0L)
      .resolvedIntervalMs == 30000L)
    assert(Requests.AggregationSpec(Aggregations.Sum, Nil, 10000L)
      .resolvedIntervalMs == 10000L)
    val zero = Engine.get(twoSeries(), Requests.GetRequest(
      variable = "/sys/*",
      aggregations = Seq(Requests.AggregationSpec(Aggregations.Sum, Nil, 0L))))
    val dflt = Engine.get(twoSeries(), Requests.GetRequest(
      variable = "/sys/*",
      aggregations = Seq(Requests.AggregationSpec(Aggregations.Sum, Nil, 30000L))))
    assert(zero.collect().toSet == dflt.collect().toSet)
  }

  test("get: max_variables caps series, max_values keeps tail") {
    val out = Engine.get(twoSeries(), Requests.GetRequest(
      variable = "/sys/cpu", maxVariables = Some(1), maxValues = Some(2)))
    // series keys sort "/sys/cpu{host=a}" < "{host=b}" -> host=a kept
    val vals = out.select("ts", "dval").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
    assert(vals == Seq((2000L, 3.0), (3000L, 6.0)))
  }

  test("get: rleOutput returns runs whose expansion equals the dense response") {
    // interpolate onto a 1s grid with rleOutput: the run-emitting twin
    // replaces the dense emitter; expanding the runs must reproduce the
    // dense /get response exactly. cpu{b} is flat (2.0, 2.0) -> its
    // grid collapses to one run; cpu{a} ramps -> per-slot runs.
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("skey", "ts", "dval").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val dense = Engine.get(twoSeries(), Requests.GetRequest("/sys/cpu*",
      mutations = Seq(Requests.Interpolate(1000L))))
    val runs = Engine.get(twoSeries(), Requests.GetRequest("/sys/cpu*",
      mutations = Seq(Requests.Interpolate(1000L)), rleOutput = true))
    assert(rows(graft.operators.Rle.expand(runs, 1000L)) == rows(dense))
    // the flat series really collapsed
    val bRuns = runs.filter(col("skey").contains("host=b")).collect()
    assert(bRuns.length == 1 && bRuns.head.getAs[Long]("end_ts") == 2000L,
      s"flat series should be one run: ${bRuns.toSeq}")
    // no mutations: raw points run-collapse via Rle.encode
    val raw = Engine.get(twoSeries(), Requests.GetRequest("/sys/cpu*",
      rleOutput = true))
    assert(raw.columns.contains("end_ts") && raw.count() == 4) // b collapses
    // refusals: aggregations and independent mode are incompatible
    intercept[IllegalArgumentException] {
      Engine.get(twoSeries(), Requests.GetRequest("/sys/cpu*",
        aggregations = Seq(Requests.AggregationSpec(Aggregations.Average)),
        rleOutput = true))
    }
    intercept[IllegalArgumentException] {
      Engine.get(twoSeries(), Requests.GetRequest("/sys/cpu*",
        mutations = Seq(Requests.Rate(), Requests.Delta),
        chainMutations = false, rleOutput = true))
    }
  }

  test("list: distinct series within lookback") {
    val out = Engine.list(twoSeries(), Requests.ListRequest("/sys/*"),
      nowMs = 3000L)
    assert(out.count() == 3)
    val narrow = Engine.list(twoSeries(),
      Requests.ListRequest("/sys/*", maxAgeMs = 1500L), nowMs = 3000L)
    // only points with ts >= 1500 -> cpu{a} (2000,3000), cpu{b} (2000)
    assert(narrow.count() == 2)
  }

  test("add: enriches hostname, rejects bad names and future timestamps") {
    import spark.implicits._
    val raw = Seq(
      ("/ok/var", 1000L), ("bad name", 1000L), ("x", 1000L),
      ("/future", 99999999999999L))
      .toDF("name", "ts")
      .select(col("name"), map().cast("map<string,string>").as("labels"),
        lit("GAUGE").as("value_type"), col("ts"),
        lit(1.0).as("dval"), lit(null).cast("string").as("sval"),
        lit(null).cast("long").as("end_ts"))
    val (ok, bad) = Engine.add(raw, hostname = "h1", nowMs = 5000L)
    assert(ok.count() == 1)
    val labels = ok.select(element_at(col("labels"), "hostname")).head().getString(0)
    assert(labels == "h1")
    val reasons = bad.select("reject_reason").collect().map(_.getString(0)).sorted
    assert(reasons.count(_ == "invalid variable name") == 2)
    assert(reasons.count(_ == "future timestamp") == 1)
  }
}

class MultimodalSpec extends SparkSpec {
  test("extractFeatures: stable metadata + fixed-width feature vector") {
    import spark.implicits._
    val docs = Seq((0L, "hello world", "s0"), (1L, "foo", "s1"), (2L, "bar baz", "s2"))
      .toDF("doc_id", "text", "source")
    val feats = Multimodal.extractFeatures(Multimodal.fromDocuments(docs))
    val rows = feats.collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getString(3).length == 32) // md5 hex
      assert(r.getSeq[Float](7).length == Multimodal.StubDecoder.FeatureDim)
    }
    // doc 0 -> modality image (0 % 3 = 0 -> index 1)
    val img = rows.find(_.getLong(0) == 0L).get
    assert(img.getString(1) == "image")
    assert(img.getLong(2) == "hello world".getBytes("UTF-8").length.toLong)
    assert(!img.isNullAt(4) && img.getInt(4) >= 16)
  }

  test("extractFeatures: real imageio decode for decodable image bytes") {
    import spark.implicits._
    // a genuine 40x25 PNG, generated in-process (javax.imageio is JDK)
    val img = new java.awt.image.BufferedImage(
      40, 25, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 40; y <- 0 until 25)
      img.setRGB(x, y, ((x * 6) << 16) | ((y * 10) << 8) | 0x40)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val png = bos.toByteArray
    val media = Seq((7L, "image", png, "image/png"))
      .toDF("item_id", "modality", "content", "mime")
      .select(col("item_id"), col("modality"), col("content"), col("mime"),
        map().cast("map<string,string>").as("meta"))
    val row = Multimodal.extractFeatures(media).head()
    assert(row.getInt(4) == 40 && row.getInt(5) == 25) // REAL dimensions
    assert(row.getInt(6) == 1)
    assert(row.getSeq[Float](7).length == Multimodal.StubDecoder.FeatureDim)
    assert(row.getString(8) == "imageio") // provenance: real decode
    // undecodable image bytes still fall back to the deterministic stub
    val fake = Seq((8L, "image", "not a png".getBytes("UTF-8"), "image/png"))
      .toDF("item_id", "modality", "content", "mime")
      .select(col("item_id"), col("modality"), col("content"), col("mime"),
        map().cast("map<string,string>").as("meta"))
    val frow = Multimodal.extractFeatures(fake).head()
    assert(!frow.isNullAt(4) && frow.getInt(4) >= 16) // stub-derived
    assert(frow.getString(8) == "stub") // provenance: fake decode
  }

  test("extractFeatures: real javax.sound decode for WAV audio bytes") {
    import spark.implicits._
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    // a genuine 500-frame 16-bit mono 8kHz WAV, generated in-process
    val nFrames = 500
    val pcm = new Array[Byte](nFrames * 2)
    for (i <- 0 until nFrames) {
      val s = (math.sin(i / 10.0) * 12000).toInt
      pcm(2 * i) = (s & 0xFF).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xFF).toByte
    }
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong),
      AudioFileFormat.Type.WAVE, bos)
    val media = Seq((9L, "audio", bos.toByteArray, "audio/wav"))
      .toDF("item_id", "modality", "content", "mime")
      .select(col("item_id"), col("modality"), col("content"), col("mime"),
        map().cast("map<string,string>").as("meta"))
    val row = Multimodal.extractFeatures(media).head()
    assert(row.isNullAt(4) && row.isNullAt(5)) // audio: no dimensions
    assert(row.getInt(6) == nFrames)           // REAL frame count
    val feat = row.getSeq[Float](7)
    assert(feat.length == Multimodal.StubDecoder.FeatureDim)
    assert(feat.forall(f => f >= -1f && f <= 1f) && feat.exists(_ != 0f))
    assert(row.getString(8) == "pcm") // provenance: real sample decode
    // undecodable audio bytes still fall back to the deterministic stub
    val fake = Seq((10L, "audio", "not a wav".getBytes("UTF-8"), "audio/wav"))
      .toDF("item_id", "modality", "content", "mime")
      .select(col("item_id"), col("modality"), col("content"), col("mime"),
        map().cast("map<string,string>").as("meta"))
    val frow = Multimodal.extractFeatures(fake).head()
    assert(frow.getInt(6) >= 1) // stub-derived frame count
    assert(frow.getString(8) == "stub") // provenance: fake decode
  }

  test("sampleFrames strides over video frames only") {
    import spark.implicits._
    val docs = Seq((2L, "some video content", "s")).toDF("doc_id", "text", "source")
    val feats = Multimodal.extractFeatures(Multimodal.fromDocuments(docs))
    val nFrames = feats.head().getInt(6)
    val frames = Multimodal.sampleFrames(feats, stride = 10).collect()
    assert(frames.length == (nFrames + 9) / 10)
    assert(frames.map(_.getInt(1)).forall(_ % 10 == 0))
  }
}
