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
      val (ok, _) = Rpc.decodeAddResponse(post(srv.boundPort, "/add", addBody))
      assert(ok)

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
      val listResp = post(srv.boundPort, "/list", listBody)
      val (lok, vars) = Rpc.decodeListResponse(listResp)
      assert(lok)
      assert(vars.exists(v => v.name == "/http/counter" &&
        v.labels.get("host").contains("a")))

      // per-phase timers ride the responses (GetResponse.timer=4,
      // ListResponse.timer=5), with the Go server's phase names
      val getTimers = Rpc.decodeTimers(post(srv.boundPort, "/get", getBody), 4)
      assert(getTimers.map(_._1) ==
        Seq("retrieve streams", "construct response"))
      assert(getTimers.forall(_._2 >= 0))
      assert(Rpc.decodeTimers(listResp, 5).map(_._1) ==
        Seq("retrieve variables", "construct response"))
    } finally srv.stop()
  }

  test("gorilla tier serves /get and /list; /add rejects read-only") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_gor").toString + "/g"
    // hot points -> cold tier, then the SAME wire surface reads it
    val pts = graft.model.Point.withSeriesKey(series(
        Seq(1000L -> 10.0, 2000L -> 30.0, 3000L -> 60.0),
        name = "/http/cold", labels = Map("host" -> "a")))
      .select(col("skey"), col("ts"), col("dval"))
    graft.sources.PointSource.writeGorilla(pts, dir)
    val srv = new StoreHttpServer(spark, dir, port = 0,
      nowMs = () => 100000L, tier = "gorilla").start()
    try {
      val getBody = Rpc.encodeGetRequest(Requests.GetRequest(
        "/http/cold{host=a}", mutations = Seq(Requests.Rate())))
      val (gok, gerr, streams) =
        Rpc.decodeGetResponse(post(srv.boundPort, "/get", getBody))
      assert(gok, gerr.toString)
      assert(streams.head.variable.labels("host") == "a")
      assert(streams.head.values.map(v => (v._1, v._2.get)) ==
        Seq((2000L, 20.0), (3000L, 30.0)))
      val addBody = Rpc.encodeAddRequest(Seq(Rpc.Stream(
        Variable("/http/cold", Map("host" -> "a"), Variable.Gauge),
        Seq((5000L, Some(1.0), None, None)))))
      val (code, _) = postRaw(srv.boundPort, "/add", addBody)
      assert(code == 500, s"/add on the cold tier must reject, got $code")
    } finally srv.stop()
  }

  test("tiered serving: /get spans hot parquet and cold gorilla; /add lands hot") {
    import org.apache.spark.sql.functions._
    val base = java.nio.file.Files.createTempDirectory("graft_tiered").toString
    val hot = s"$base/hot"; val cold = s"$base/cold"
    val day = 86400000L
    // two days of points, day 0 ages cold, day 1 stays hot
    graft.sources.PointSource.write(series(
      Seq(1000L -> 1.0, 2000L -> 2.0, (day + 1000L) -> 3.0),
      name = "/http/span", labels = Map("host" -> "a")), hot)
    graft.sources.PointSource.ageIntoGorilla(spark, hot, cold,
      olderThanMs = 1000L, nowMs = day + 2000L)
    val srv = new StoreHttpServer(spark, hot, port = 0,
      nowMs = () => day + 2000L, tier = "tiered", coldDir = Some(cold)).start()
    try {
      val getBody = Rpc.encodeGetRequest(Requests.GetRequest(
        "/http/span{host=a}", minTimestamp = Some(0L)))
      val (gok, gerr, streams) =
        Rpc.decodeGetResponse(post(srv.boundPort, "/get", getBody))
      assert(gok, gerr.toString)
      assert(streams.head.values.map(v => (v._1, v._2.get)) ==
        Seq((1000L, 1.0), (2000L, 2.0), (day + 1000L, 3.0)),
        "one stream must span the aging boundary")
      // writes stay open on the tiered surface (they land hot)
      val addBody = Rpc.encodeAddRequest(Seq(Rpc.Stream(
        Variable("/http/span", Map("host" -> "a"), Variable.Gauge),
        Seq((day + 1500L, Some(4.0), None, None)))))
      val (code, _) = postRaw(srv.boundPort, "/add", addBody)
      assert(code == 200, s"/add on the tiered surface must accept, got $code")
      // the added point carries the ingest hostname label (a second
      // series of the same name); 4 points total span both tiers + add
      val (gok2, _, streams2) =
        Rpc.decodeGetResponse(post(srv.boundPort, "/get", getBody))
      assert(gok2 && streams2.map(_.values.length).sum == 4)
    } finally srv.stop()
  }

  test("/get_config round-trips StoreConfig; /status serves HTML") {
    import graft.retention.Retention
    val store = java.nio.file.Files.createTempDirectory("graft_http3").toString + "/s"
    val policy = Retention.Policy(Seq(
      Retention.PolicyItem(Seq("/http/*"), Retention.Keep,
        maxAgeMs = 86400000L, comment = "keep a day raw"),
      Retention.PolicyItem(Seq("/http/*"), Retention.Keep,
        minAgeMs = 86400000L, mutations = Seq(Requests.Latest(3600000L))),
      Retention.PolicyItem(Nil, Retention.Drop)))
    val srv = new StoreHttpServer(spark, store, nowMs = () => 5000L,
      retention = policy).start()
    try {
      for (path <- Seq("/get_config", "/config")) {
        val bytes = post(srv.boundPort, path, Array.empty)
        val (servers, decoded, intervalSec) = Rpc.decodeStoreConfig(bytes)
        assert(servers.map(_.address) == Seq(s"localhost:${srv.boundPort}"))
        assert(servers.head.state == 2 && servers.head.lastUpdated == 5000L)
        assert(intervalSec == 600L)
        assert(decoded.items.length == 3)
        assert(decoded.items(0).comment == "keep a day raw" &&
          decoded.items(0).maxAgeMs == 86400000L &&
          decoded.items(0).policy == Retention.Keep)
        assert(decoded.items(1).mutations == Seq(Requests.Latest(3600000L)))
        assert(decoded.items(2).policy == Retention.Drop &&
          decoded.items(2).patterns.isEmpty)
      }
      // /status is a plain HTML page, not base64
      val client = java.net.http.HttpClient.newHttpClient()
      val resp = client.send(
        java.net.http.HttpRequest.newBuilder(
          URI.create(s"http://127.0.0.1:${srv.boundPort}/status")).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      assert(resp.statusCode() == 200)
      assert(resp.body().contains("Store Status"))
      // r16: the session-cache memo stats render too (observability
      // for the index-format marker memo and the corpus-count memo)
      assert(resp.body().contains("Session caches"))
      assert(resp.body().contains("index-format markers"))
      assert(resp.body().contains("corpus counts"))
    } finally srv.stop()
  }

  test("C++ mutation semantics: one wire stream per mutation per series") {
    val store = java.nio.file.Files.createTempDirectory("graft_http5").toString + "/s"
    val srv = new StoreHttpServer(spark, store, nowMs = () => 100000L,
      cppMutationSemantics = true).start()
    try {
      post(srv.boundPort, "/add", Rpc.encodeAddRequest(Seq(Rpc.Stream(
        Variable("/cpp/x", Map("h" -> "a"), Variable.Gauge),
        Seq((1000L, Some(1.0), None, None), (2000L, Some(5.0), None, None))))))
      val body = Rpc.encodeGetRequest(Requests.GetRequest(
        "/cpp/x", mutations = Seq(Requests.Mean(10000L), Requests.MaxM(10000L))))
      val (ok, _, streams) = Rpc.decodeGetResponse(post(srv.boundPort, "/get", body))
      assert(ok)
      // server/store.cc:140-147: each mutation appends its own stream
      assert(streams.length == 2, streams.toString)
      val vals = streams.map(_.values.map(_._2.get).toList).sortBy(_.head)
      assert(vals == Seq(List(3.0), List(5.0))) // mean and max of raw
    } finally srv.stop()
  }

  test("10+ independent mutations keep request order (no lexicographic #10<#2)") {
    // Streams carry no mutation tag — clients attribute them positionally
    // (server/store.cc:140-147). With ≥10 mutations a string-keyed sort
    // would place "#10" before "#2"; ordering must be numeric on mut_idx.
    val store = java.nio.file.Files.createTempDirectory("graft_http6").toString + "/s"
    val srv = new StoreHttpServer(spark, store, nowMs = () => 100000L,
      cppMutationSemantics = true).start()
    try {
      post(srv.boundPort, "/add", Rpc.encodeAddRequest(Seq(Rpc.Stream(
        Variable("/cpp/ord", Map("h" -> "a"), Variable.Gauge),
        Seq((1000L, Some(1.0), None, None), (2000L, Some(5.0), None, None))))))
      val cycle = Seq(Requests.Mean(10000L), Requests.MaxM(10000L),
        Requests.MinM(10000L))
      val muts = Seq.fill(4)(cycle).flatten // 12 mutations, idx 0..11
      val body = Rpc.encodeGetRequest(
        Requests.GetRequest("/cpp/ord", mutations = muts))
      val (ok, _, streams) = Rpc.decodeGetResponse(post(srv.boundPort, "/get", body))
      assert(ok)
      assert(streams.length == 12, streams.toString)
      val heads = streams.map(_.values.head._2.get)
      assert(heads == Seq(3.0, 5.0, 1.0, 3.0, 5.0, 1.0, 3.0, 5.0, 1.0, 3.0, 5.0, 1.0),
        s"streams must follow mutation request order, got $heads")
    } finally srv.stop()
  }

  test("concurrent /add requests all persist (append write race)") {
    val store = java.nio.file.Files.createTempDirectory("graft_http4").toString + "/s"
    val srv = new StoreHttpServer(spark, store, nowMs = () => 100000L).start()
    try {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.ExecutionContext.Implicits.global
      import scala.concurrent.duration._
      val adds = (0 until 4).map { i =>
        Future {
          val body = Rpc.encodeAddRequest(Seq(Rpc.Stream(
            Variable(s"/http/conc", Map("host" -> s"h$i"), Variable.Gauge),
            Seq((1000L + i, Some(i.toDouble), None, None)))))
          Rpc.decodeAddResponse(post(srv.boundPort, "/add", body))._1
        }
      }
      assert(Await.result(Future.sequence(adds), 120.seconds).forall(identity))
      val listBody = Rpc.encodeListRequest(
        Requests.ListRequest("/http/conc", maxAgeMs = 86400000L))
      val (_, vars) = Rpc.decodeListResponse(post(srv.boundPort, "/list", listBody))
      assert(vars.map(_.labels("host")).toSet == Set("h0", "h1", "h2", "h3"))
    } finally srv.stop()
  }

  test("unbounded /get over a large match is capped: 413, never a full collect") {
    val store = java.nio.file.Files.createTempDirectory("graft_http7").toString + "/s"
    // cap at 10 so the fixture (30 points) overflows it
    val srv = new StoreHttpServer(spark, store, nowMs = () => 100000L,
      maxResponseValues = 10).start()
    try {
      post(srv.boundPort, "/add", Rpc.encodeAddRequest(Seq(Rpc.Stream(
        Variable("/http/big", Map("host" -> "a"), Variable.Gauge),
        (0 until 30).map(i => (1000L + i, Some(i.toDouble), None, None))))))
      // no max_values / max_variables on the request -> default bound
      // kicks in, server rejects loudly instead of materializing all
      val unbounded = Rpc.encodeGetRequest(Requests.GetRequest("/http/big"))
      val (code, bytes) = postRaw(srv.boundPort, "/get", unbounded)
      assert(code == 413, s"expected 413 over-limit, got $code")
      val (ok, err, streams) = Rpc.decodeGetResponse(bytes)
      assert(!ok && err.exists(_.contains("max_values")) && streams.isEmpty,
        s"ok=$ok err=$err")
      // the same match WITH an explicit limit is served normally
      val bounded = Rpc.encodeGetRequest(Requests.GetRequest("/http/big",
        maxValues = Some(5)))
      val (gok, gerr, gs) =
        Rpc.decodeGetResponse(post(srv.boundPort, "/get", bounded))
      assert(gok, gerr.toString)
      assert(gs.head.values.length == 5, gs.head.values.length.toString)
    } finally srv.stop()
  }

  test("/get probe plans without a global Sort; streams still time-ordered") {
    val store = java.nio.file.Files.createTempDirectory("graft_http8").toString + "/s"
    val srv = new StoreHttpServer(spark, store, nowMs = () => 100000L).start()
    try {
      // points added OUT of time order — the wire response must sort
      // them per stream even though the server no longer orderBy("ts")s
      post(srv.boundPort, "/add", Rpc.encodeAddRequest(Seq(Rpc.Stream(
        Variable("/http/ord", Map("host" -> "a"), Variable.Gauge),
        Seq((3000L, Some(3.0), None, None), (1000L, Some(1.0), None, None),
          (2000L, Some(2.0), None, None))))))
      // the server's probe shape: Engine.get(...).limit(cap+1) — must
      // plan as CollectLimit with no Sort anywhere (an over-cap
      // request then fails fast instead of paying a global top-K)
      val df = graft.api.Engine.get(
        graft.sources.PointSource.read(spark, store),
        Requests.GetRequest("/http/ord"))
      val plan = df.limit(11).queryExecution.executedPlan.toString
      assert(plan.contains("CollectLimit"), plan.take(1500))
      assert(!plan.contains("Sort"),
        s"over-cap probe must not plan a Sort:\n${plan.take(1500)}")
      val (gok, gerr, gs) = Rpc.decodeGetResponse(post(srv.boundPort, "/get",
        Rpc.encodeGetRequest(Requests.GetRequest("/http/ord"))))
      assert(gok, gerr.toString)
      assert(gs.head.values.map(_._1) == Seq(1000L, 2000L, 3000L),
        "per-stream values must be time-ordered on the wire")
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
