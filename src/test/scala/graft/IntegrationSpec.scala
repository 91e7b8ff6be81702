package graft

import graft.api.Requests
import graft.http.StoreHttpServer
import graft.model.Variable
import graft.retention.Retention
import graft.retention.Retention.{Drop, Keep, Policy, PolicyItem}
import graft.sources.{PointSource, ProtoRecordFile}
import graft.wire.Rpc
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.util.Base64
import org.apache.spark.sql.functions._

/**
 * The full migration story: reference record file → Parquet store →
 * compaction → retention rewrite → served to a wire-format client.
 */
class IntegrationSpec extends SparkSpec {

  test("record file -> store -> compact -> retention -> HTTP get") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_e2e").toString
    val nowMs = 1000L * 86400000L

    // 1. a reference record file: one fresh counter, one ancient series
    val fresh = (0 until 48).map(i =>
      (nowMs - 86400000L + i * 1800000L, Some(i * 10.0), None: Option[String], None: Option[Long]))
    val ancient = (0 until 5).map(i =>
      (1000L + i * 1000L, Some(1.0), None: Option[String], None: Option[Long]))
    val recBytes = ProtoRecordFile.frame(Seq(
      ProtoRecordFile.encodeValueStream("/e2e/reqs", Map("host" -> "h1"), "GAUGE", fresh),
      ProtoRecordFile.encodeValueStream("/e2e/old", Map.empty, "GAUGE", ancient)))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$tmp/datastore.123.bin"), recBytes)

    // 2. migrate into the at-rest layout via the splittable V2 scan
    // (the production path — a multi-GB record log reads in parallel;
    // tiny splitBytes here forces the boundary-resync machinery)
    val migrated = graft.sources.ProtoRecordV2.read(spark, tmp, Some(64L))
    assert(migrated.count() == 53)
    PointSource.write(migrated, s"$tmp/store")

    // 3. compact (no-op data-wise; layout preserved)
    PointSource.compact(spark, s"$tmp/store")

    // 4. retention: keep /e2e/* for 30 days, drop the rest
    val kept = Retention.apply(
      PointSource.read(spark, s"$tmp/store"),
      Policy(Seq(
        PolicyItem(Seq("/e2e/*"), Keep, maxAgeMs = 30L * 86400000L),
        PolicyItem(Nil, Drop))),
      nowMs)
    PointSource.write(kept.drop("skey"), s"$tmp/store2")
    assert(spark.read.parquet(s"$tmp/store2").count() == 48) // ancient dropped

    // 5. serve it; a wire-format client runs get with a RATE mutation
    val srv = new StoreHttpServer(spark, s"$tmp/store2", port = 0,
      nowMs = () => nowMs).start()
    try {
      val body = Rpc.encodeGetRequest(Requests.GetRequest(
        "/e2e/reqs{host=h1}", mutations = Seq(Requests.Rate())))
      val client = HttpClient.newHttpClient()
      val resp = client.send(
        HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:${srv.boundPort}/get"))
          .POST(HttpRequest.BodyPublishers.ofByteArray(
            Base64.getEncoder.encode(body))).build(),
        HttpResponse.BodyHandlers.ofByteArray())
      assert(resp.statusCode() == 200)
      val (ok, err, streams) = Rpc.decodeGetResponse(
        Base64.getMimeDecoder.decode(resp.body()))
      assert(ok, err.toString)
      assert(streams.length == 1)
      assert(streams.head.variable.name == "/e2e/reqs")
      // counter rises 10 per 1800s -> rate 10/1800 per second
      val rates = streams.head.values.flatMap(_._2)
      assert(rates.length == 47)
      rates.foreach(r => assert(math.abs(r - 10.0 / 1800.0) < 1e-12))
    } finally srv.stop()
  }
}
