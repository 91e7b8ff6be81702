package graft

import graft.api.Requests
import graft.http.StoreHttpServer
import graft.model.Variable
import graft.operators.Aggregations
import graft.wire.Rpc
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.util.Base64

/** Wire-compatibility: a "reference client" (our codec doubling as one)
  * drives add/get/list over HTTP+base64-protobuf. */
class HttpSpec extends SparkSpec {

  private def postRaw(port: Int, path: String, body: Array[Byte]): (Int, Array[Byte]) = {
    val client = HttpClient.newHttpClient()
    val req = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
      .POST(HttpRequest.BodyPublishers.ofByteArray(
        Base64.getEncoder.encode(body)))
      .build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofByteArray())
    (resp.statusCode(), Base64.getMimeDecoder.decode(resp.body()))
  }

  private def post(port: Int, path: String, body: Array[Byte]): Array[Byte] = {
    val (code, bytes) = postRaw(port, path, body)
    assert(code == 200, s"$path -> $code")
    bytes
  }

  test("add -> get(rate) -> list round-trip over HTTP+base64-protobuf") {
    val store = java.nio.file.Files.createTempDirectory("graft_http").toString + "/s"
    val srv = new StoreHttpServer(spark, store, port = 0,
      nowMs = () => 100000L).start()
    try {
      // /add: one counter series, three points
      val addBody = Rpc.encodeAddRequest(Seq(Rpc.Stream(
        Variable("/http/counter", Map("host" -> "a"), Variable.Gauge),
        Seq((1000L, Some(10.0), None, None),
          (2000L, Some(30.0), None, None),
          (3000L, Some(60.0), None, None)))))
      val (ok, _, _) = Rpc.decodeGetResponse(post(srv.boundPort, "/add", addBody))
      assert(ok) // AddResponse success bit shares field 1

      // /get with a RATE mutation
      val getBody = Rpc.encodeGetRequest(Requests.GetRequest(
        "/http/counter{host=a}", mutations = Seq(Requests.Rate())))
      val (gok, gerr, streams) = Rpc.decodeGetResponse(post(srv.boundPort, "/get", getBody))
      assert(gok, gerr.toString)
      assert(streams.length == 1)
      assert(streams.head.variable.name == "/http/counter")
      assert(streams.head.variable.labels("host") == "a")
      val vals = streams.head.values.map(v => (v._1, v._2.get))
      assert(vals == Seq((2000L, 20.0), (3000L, 30.0)))

      // /get with aggregation by name
      val aggBody = Rpc.encodeGetRequest(Requests.GetRequest(
        "/http/counter",
        aggregations = Seq(Requests.AggregationSpec(Aggregations.Sum, Nil, 10000L))))
      val (aok, _, aggStreams) = Rpc.decodeGetResponse(post(srv.boundPort, "/get", aggBody))
      assert(aok && aggStreams.nonEmpty)
      assert(aggStreams.head.values.head._2.contains(100.0))

      // /get aggregated BY LABEL: one stream per distinct label value
      // (server/store.cc:190-248), each carrying its own label set
      val addB = Rpc.encodeAddRequest(Seq(Rpc.Stream(
        Variable("/http/counter", Map("host" -> "b"), Variable.Gauge),
        Seq((1000L, Some(1.0), None, None), (2000L, Some(2.0), None, None)))))
      post(srv.boundPort, "/add", addB)
      val byLabel = Rpc.encodeGetRequest(Requests.GetRequest(
        "/http/counter",
        aggregations = Seq(Requests.AggregationSpec(
          Aggregations.Sum, Seq("host"), 10000L))))
      val (bok, _, ls) = Rpc.decodeGetResponse(post(srv.boundPort, "/get", byLabel))
      assert(bok)
      val hosts = ls.map(_.variable.labels.get("host"))
      assert(hosts.toSet == Set(Some("a"), Some("b")), ls.map(_.variable).toString)
      val sumA = ls.find(_.variable.labels.get("host").contains("a")).get
      assert(sumA.values.head._2.contains(100.0))

      // /list
      val listBody = Rpc.encodeListRequest(Requests.ListRequest("/http/*"))
      val (lok, vars) = Rpc.decodeListResponse(post(srv.boundPort, "/list", listBody))
      assert(lok)
      assert(vars.exists(v => v.name == "/http/counter" &&
        v.labels.get("host").contains("a")))
    } finally srv.stop()
  }

  test("malformed request returns a decodable error response, not a hang") {
    val store = java.nio.file.Files.createTempDirectory("graft_http2").toString + "/s"
    val srv = new StoreHttpServer(spark, store).start()
    try {
      val (code, bytes) = postRaw(srv.boundPort, "/get", Array[Byte](1, 2, 3))
      assert(code == 500)
      val (ok, err, _) = Rpc.decodeGetResponse(bytes)
      assert(!ok && err.nonEmpty)
    } finally srv.stop()
  }
}
