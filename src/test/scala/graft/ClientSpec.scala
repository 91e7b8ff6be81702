package graft

import graft.api.{Engine, Requests}
import graft.client.{Instrument, SystemStats, VariableExporter}
import graft.client.Instrument._
import graft.http.StoreHttpServer
import graft.model.Variable
import graft.wire.Rpc

/** Data-producer surfaces (SURVEY §2.4 rows 5-6): the instrumentation
  * library (lib/exported_vars.h:52-226 semantics) and the system-stats
  * collector (client/python/system_status.py), end-to-end into the
  * engine's ingest + query path. */
class ClientSpec extends SparkSpec {

  private def fresh() = new VariableExporter

  // ------------------------------------------------------ instrumentation

  test("ExportedInteger: counter ops and snapshot shape") {
    val ex = fresh()
    val c = ExportedInteger("/test/counter", exporter = ex)
    assert(c.inc() == 1L)
    assert(c.add(5L) == 6L)
    assert(c.dec() == 5L)
    c.set(42L)
    assert(c.get == 42L)
    val Seq(s) = ex.snapshot(nowMs = 777L)
    assert(s.variable == Variable("/test/counter"))
    assert(s.values == Seq((777L, Some(42.0), None, None)))
  }

  test("ExportedRatio exports -total/-success/-failure triple") {
    val ex = fresh()
    val r = ExportedRatio("/test/requests", Map("job" -> "api"), exporter = ex)
    r.success(); r.success(); r.failure()
    val byName = ex.snapshot(1L)
      .map(s => s.variable.name -> s.values.head._2.get).toMap
    assert(byName == Map(
      "/test/requests-total" -> 3.0,
      "/test/requests-success" -> 2.0,
      "/test/requests-failure" -> 1.0))
    // labels ride along on all three
    assert(ex.snapshot(1L).forall(_.variable.labels("job") == "api"))
  }

  test("ExportedAverage: RATE-typed -total-count / -overall-sum") {
    val ex = fresh()
    val a = ExportedAverage("/test/latency", exporter = ex)
    a.update(30L); a.update(50L, 2L)
    assert(a.overallSum == 80L && a.totalCount == 3L)
    val snaps = ex.snapshot(1L)
    val count = snaps.find(_.variable.name == "/test/latency-total-count").get
    val sum = snaps.find(_.variable.name == "/test/latency-overall-sum").get
    assert(count.values.head._2.contains(3.0))
    assert(sum.values.head._2.contains(80.0))
    // both halves carry the RATE value type (exported_vars.cc:293-294)
    assert(count.variable.valueType == Variable.Rate)
    assert(sum.variable.valueType == Variable.Rate)
  }

  test("ExportedTimer: units=ms on the sum; time block and contexts") {
    val ex = fresh()
    val t = ExportedTimer("/test/rpc_time", exporter = ex)
    val out = t.time { 21 * 2 }
    assert(out == 42)
    assert(t.totalCount == 1L)
    val ctx = t.start(); ctx.stop(); ctx.stop()   // second stop is a no-op
    assert(t.totalCount == 2L)
    val cancelled = t.start(); cancelled.cancel(); cancelled.stop()
    assert(t.totalCount == 2L)                     // cancel discards
    val sum = ex.snapshot(1L)
      .find(_.variable.name == "/test/rpc_time-overall-sum").get
    assert(sum.variable.labels.get("units").contains("ms"))
  }

  test("ExportedIntegerSet prefixes names with exactly one slash") {
    val ex = fresh()
    val set = ExportedIntegerSet("/myapp/", exporter = ex)
    set("queries").add(7)
    set("/errors").inc()
    set("queries").inc() // same counter, not a new one
    val byName = ex.snapshot(1L)
      .map(s => s.variable.name -> s.values.head._2.get).toMap
    assert(byName == Map("/myapp/queries" -> 8.0, "/myapp/errors" -> 1.0))
    // un-prefixed set roots names at /
    val bare = ExportedIntegerSet(exporter = fresh())
    assert(bare("loose").variable.name == "/loose")
  }

  test("exporter labels overwrite per-var labels; callbacks run pre-export") {
    val ex = fresh()
    val g = ExportedInteger("/test/gauge", labels = Map("host" -> "stale"),
      exporter = ex)
    ex.setExportLabel("host", "h1")
    ex.setExportLabel("job", "store")
    var ticks = 0
    ex.addExportCallback(() => { ticks += 1; g.set(9L) })
    val Seq(s) = ex.snapshot(5L)
    assert(ticks == 1)
    assert(s.variable.labels == Map("host" -> "h1", "job" -> "store"))
    assert(s.values.head._2.contains(9.0))
    ex.clearExportLabel("job")
    assert(ex.snapshot(6L).head.variable.labels == Map("host" -> "h1"))
    assert(ticks == 2)
  }

  test("exportToString renders canonical\\tvalue lines") {
    val ex = fresh()
    ExportedInteger("/s/count", labels = Map("a" -> "1"), exporter = ex).set(3)
    ExportedString("/s/version", exporter = ex).set("v1.2")
    val text = ex.exportToString(1L)
    assert(text.linesIterator.toSet ==
      Set("/s/count{a=1}\t3", "/s/version\tv1.2"))
  }

  test("unregister removes a variable from the export set") {
    val ex = fresh()
    val a = ExportedInteger("/u/a", exporter = ex)
    ExportedInteger("/u/b", exporter = ex)
    assert(ex.size == 2)
    assert(ex.unregister(a))
    assert(ex.snapshot(1L).map(_.variable.name) == Seq("/u/b"))
  }

  test("snapshot round-trips the add wire codec") {
    val ex = fresh()
    ExportedInteger("/wire/c", labels = Map("k" -> "v"), exporter = ex).set(11)
    val bytes = Rpc.encodeAddRequest(ex.snapshot(123L))
    val streams = Rpc.decodeAddRequest(bytes)
    assert(streams.map(s => (s.variable.name, s.variable.labels, s.values)) ==
      Seq(("/wire/c", Map("k" -> "v"), Seq((123L, Some(11.0), None, None)))))
  }

  test("end-to-end: instrument -> HTTP export thread -> store -> query") {
    val dir = java.nio.file.Files.createTempDirectory("graft_instr").toString
    val store = s"$dir/store"
    val srv = new StoreHttpServer(spark, store, port = 0).start()
    try {
      val ex = fresh()
      ex.setExportLabel("job", "worker")
      val qps = ExportedInteger("/app/queries", exporter = ex)
      qps.add(100L)
      // one manual push (the export thread's body), then the scheduled
      // loop (interval short enough to observe a second sample)
      val (ok, err) = ex.exportToStore(s"http://127.0.0.1:${srv.boundPort}")
      assert(ok, err.toString)
      qps.add(50L)
      ex.startExportThread(s"http://127.0.0.1:${srv.boundPort}", intervalMs = 200L)
      try {
        val deadline = System.currentTimeMillis() + 15000L
        var rows = Seq.empty[(Long, Double)]
        while (rows.size < 2 && System.currentTimeMillis() < deadline) {
          Thread.sleep(100L)
          rows = try {
            Engine.get(graft.sources.PointSource.read(spark, store),
              Requests.GetRequest("/app/queries{job=worker}"))
              .select("ts", "dval").collect()
              .map(r => (r.getLong(0), r.getDouble(1))).toSeq.sortBy(_._1)
          } catch { case _: Exception => Nil } // store not written yet
        }
        assert(rows.size >= 2, s"expected >=2 exported samples, got $rows")
        assert(rows.head._2 == 100.0)
        assert(rows.last._2 == 150.0)
      } finally ex.stopExportThread()
    } finally srv.stop()
  }

  // ---------------------------------------------------------- collectors

  private val procStatFixture =
    """cpu  1000 20 300 8000 40 5 6 0 0 0
      |cpu0 500 10 150 4000 20 2 3 0 0 0
      |intr 123456 0 9 0 0
      |ctxt 987654
      |btime 1700000000
      |processes 4242
      |procs_running 3
      |procs_blocked 1
      |softirq 600 100 200 300
      |""".stripMargin

  test("cpuStats: jiffies/HZ, per-cpu labels, counters and gauges") {
    val pts = SystemStats.cpuStats(procStatFixture, "h1", ts = 1000L,
      hz = 100.0, nowSec = 1700000100.0)
    val user = pts.filter(_.name == "/system/stats/cpu_stats/user")
    assert(user.map(p => p.labels("cpu") -> p.dval.get).toMap ==
      Map("total" -> 10.0, "0" -> 5.0)) // 1000/100, 500/100
    assert(user.forall(p => p.labels("datatype") == "counter" &&
      p.labels("units") == "seconds" && p.labels("hostname") == "h1"))
    val byName = pts.map(p => (p.name, p.labels.getOrElse("irq", "")) -> p.dval.get).toMap
    assert(byName(("/system/stats/cpu_stats/interrupts", "")) == 123456.0)
    assert(byName(("/system/stats/cpu_stats/context_switches", "")) == 987654.0)
    assert(byName(("/system/stats/uptime", "")) == 100.0) // nowSec - btime
    assert(byName(("/system/stats/processes_started", "")) == 4242.0)
    assert(byName(("/system/stats/processes_running", "")) == 3.0)
    assert(byName(("/system/stats/processes_blocked", "")) == 1.0)
    // softirq: total + one per vector (system_status.py:83-89)
    assert(byName(("/system/stats/softirq", "total")) == 600.0)
    assert(byName(("/system/stats/softirq", "1")) == 200.0)
    assert(pts.forall(_.ts == 1000L))
  }

  test("memoryStats: kB scaling and key normalization") {
    val fixture =
      """MemTotal:       16384 kB
        |MemFree:         8192 kB
        |VmallocChunk:          0 kB
        |HugePages_Total:       7
        |""".stripMargin
    val pts = SystemStats.memoryStats(fixture, "h1", 1L)
    val byName = pts.map(p => p.name -> p.dval.get).toMap
    assert(byName("/system/memory/memtotal") == 16384.0 * 1024)
    assert(byName("/system/memory/memfree") == 8192.0 * 1024)
    assert(byName("/system/memory/hugepages_total") == 7.0)
    assert(pts.forall(_.labels("datatype") == "gauge"))
  }

  test("interfaceStats: 17-field rows, fifo depths flip to gauge") {
    val fixture =
      """Inter-|   Receive                                                |  Transmit
        | face |bytes    packets errs drop fifo frame compressed multicast|bytes    packets errs drop fifo colls carrier compressed
        |  eth0: 111 22 1 2 3 4 5 6 777 88 7 8 9 10 11 12
        |""".stripMargin
    val pts = SystemStats.interfaceStats(fixture, "h1", 1L)
    val byName = pts.map(p => p.name -> p).toMap
    assert(byName("/network/interface/stats/read_bytes").dval.contains(111.0))
    assert(byName("/network/interface/stats/write_bytes").dval.contains(777.0))
    assert(byName("/network/interface/stats/write_collisions").dval.contains(10.0))
    assert(byName("/network/interface/stats/write_carrier").dval.contains(11.0))
    assert(byName("/network/interface/stats/read_bytes").labels("datatype") == "counter")
    assert(byName("/network/interface/stats/read_fifo").labels("datatype") == "gauge")
    assert(byName("/network/interface/stats/write_fifo").dval.contains(9.0))
    assert(pts.forall(_.labels("interface") == "eth0"))
  }

  test("diskStats: zero-activity devices skipped; ms counters kept") {
    val fixture =
      """   8       0 sda 100 5 2000 50 200 10 4000 80 0 120 130
        |   8      16 sdb 0 0 0 0 0 0 0 0 0 0 0
        |""".stripMargin
    val pts = SystemStats.diskStats(fixture, "h1", 1L)
    assert(pts.forall(_.labels("device") == "sda")) // sdb skipped
    val byName = pts.map(p => p.name -> p.dval.get).toMap
    assert(byName("/system/disk_stats/reads") == 100.0)
    assert(byName("/system/disk_stats/sectors_read") == 2000.0)
    assert(byName("/system/disk_stats/ms_reading") == 50.0)
    assert(byName("/system/disk_stats/writes") == 200.0)
    assert(byName("/system/disk_stats/ms_writing") == 80.0)
  }

  test("df/ntp/load/entropy/vmstat parsers") {
    val df = SystemStats.dfStats(
      """Filesystem     1024-blocks     Used Available Capacity Mounted on
        |/dev/sda1         1000000   400000    600000      40% /
        |""".stripMargin, "h1", 1L)
    assert(df.find(_.name == "/system/filesystem/size").get.dval
      .contains(1000000.0 * 1024))
    assert(df.head.labels("mountpoint") == "/" &&
      df.head.labels("device") == "/dev/sda1")
    val inodes = SystemStats.dfInodeStats(
      """Filesystem      Inodes  IUsed   IFree IUse% Mounted on
        |/dev/sda1        65536   1000   64536    2% /
        |tmpfs                0      0       0     - /dev/null
        |""".stripMargin, "h1", 1L)
    assert(inodes.map(_.labels("mountpoint")).distinct == Seq("/")) // 0-inode skipped
    assert(inodes.find(_.name == "/system/filesystem/inodes_used").get
      .dval.contains(1000.0))
    val ntp = SystemStats.ntpStats(
      """     remote           refid      st t when poll reach   delay   offset  jitter
        |*198.51.100.1    .GPS.            1 u   33   64  377    2.500   -0.300   0.125
        | 203.0.113.9     .POOL.          16 p    -   64    0    0.000   +0.000   0.001
        |""".stripMargin, "h1", 1L)
    assert(ntp.map(p => p.name -> p.dval.get).toMap ==
      Map("/ntp/delay" -> 0.0025, "/ntp/offset" -> -0.0003, "/ntp/jitter" -> 0.000125))
    assert(ntp.forall(_.labels("remote") == "198.51.100.1"))
    assert(SystemStats.loadStats("1.25 0.80 0.60 2/345 9999\n", "h1", 1L)
      .head.dval.contains(1.25))
    assert(SystemStats.entropyStats("3858\n", "h1", 1L)
      .head.dval.contains(3858.0))
    val vm = SystemStats.vmStats("nr_free_pages 5\npgfault 77\n", "h1", 1L)
    assert(vm.map(p => p.name -> p.dval.get).toMap ==
      Map("/system/vmstat/nr_free_pages" -> 5.0, "/system/vmstat/pgfault" -> 77.0))
  }

  test("apacheStats: ?auto keys, kByte scaling, scoreboard worker slots") {
    val fixture =
      """Total Accesses: 1000
        |Total kBytes: 2048
        |CPULoad: .0312
        |Uptime: 3600
        |ReqPerSec: .277
        |BytesPerSec: 582.5
        |BytesPerReq: 2097.15
        |BusyWorkers: 2
        |IdleWorkers: 8
        |Scoreboard: __WWR.....K
        |""".stripMargin
    val pts = graft.client.ServiceStats.apacheStats(fixture, "web1", 1L)
    val byName = pts.map(p => p.name -> p.dval.get).toMap
    assert(byName("/webserver/apache/hits") == 1000.0)
    assert(byName("/webserver/apache/bytes") == 2048.0 * 1024)
    assert(pts.find(_.name == "/webserver/apache/bytes").get
      .labels("units") == "bytes")
    assert(byName("/webserver/apache/busy_workers") == 2.0)
    assert(byName("/webserver/apache/worker_slots/waiting") == 2.0)
    assert(byName("/webserver/apache/worker_slots/writing") == 2.0)
    assert(byName("/webserver/apache/worker_slots/reading") == 1.0)
    assert(byName("/webserver/apache/worker_slots/keepalive") == 1.0)
    assert(byName("/webserver/apache/worker_slots/open") == 5.0)
    assert(byName("/webserver/apache/worker_slots/dns") == 0.0) // all states emitted
    assert(pts.forall(_.labels("hostname") == "web1"))
    val apc = graft.client.ServiceStats.apcStats(
      "num_hits: 55\nnum_misses: 5\njunk line\n", "web1", 1L)
    assert(apc.map(p => p.name -> p.dval.get).toMap ==
      Map("/webserver/apache/apc/num_hits" -> 55.0,
        "/webserver/apache/apc/num_misses" -> 5.0))
  }

  test("mysqlStats: lowercased keys, ON/OFF mapping, non-numeric skipped") {
    val fixture =
      """Variable_name	Value
        |Aborted_clients	12
        |Compression	OFF
        |Slave_running	ON
        |Ssl_cipher	DHE-RSA-AES256
        |Uptime	99999
        |""".stripMargin
    val pts = graft.client.ServiceStats.mysqlStats(fixture, "db1", 1L,
      port = Some("3306"))
    val byName = pts.map(p => p.name -> p.dval.get).toMap
    assert(byName == Map(
      "/database/mysql/status/aborted_clients" -> 12.0,
      "/database/mysql/status/compression" -> 0.0,
      "/database/mysql/status/slave_running" -> 1.0,
      "/database/mysql/status/uptime" -> 99999.0))
    assert(pts.forall(p => p.labels("port") == "3306" &&
      p.labels("hostname") == "db1"))
  }

  test("varnishStats: director rows get backend labels, others flatten dots") {
    val fixture =
      """client_conn            500          1.25 Client connections accepted
        |cache.hit             9000         22.50 Cache hits
        |VBE.web_director(192.0.2.10,,8080).happy 111 0.00 Happy health probes
        |uptime                 idle          0.00 Not a number row
        |""".stripMargin
    val pts = graft.client.ServiceStats.varnishStats(fixture, "cache1", 1L)
    val byName = pts.map(p => p.name -> p).toMap
    assert(byName("/varnish/status/client_conn").dval.contains(500.0))
    assert(byName("/varnish/status/cache_hit").dval.contains(9000.0))
    val vbe = byName("/varnish/status/director/web_director/happy")
    assert(vbe.dval.contains(111.0))
    assert(vbe.labels("backend") == "192.0.2.10")
    assert(vbe.labels("backend_port") == "8080")
    assert(!byName.contains("/varnish/status/uptime")) // non-numeric skipped
  }

  test("live collect() on this host yields valid ingestable points") {
    val pts = SystemStats.collect(hostname = "testhost", nowMs = 5000L)
    assert(pts.nonEmpty) // /proc exists on the test box
    assert(pts.forall(p => graft.model.Variable.isValidName(p.name)))
    assert(pts.forall(_.labels("hostname") == "testhost"))
    // every live scrape must pass ingest validation end-to-end
    val dfPts = SystemStats.toDataFrame(spark, pts)
    val (ok, bad) = Engine.add(dfPts, "testhost", nowMs = 5000L)
    assert(bad.count() == 0L)
    assert(ok.count() == pts.size.toLong)
  }

  test("end-to-end: collector scrape -> store -> engine query") {
    val pts = SystemStats.cpuStats(procStatFixture, "h9", ts = 60000L,
      hz = 100.0, nowSec = 1700000100.0) ++
      SystemStats.loadStats("0.5 0.4 0.3 1/2 3\n", "h9", 60000L)
    val dir = java.nio.file.Files.createTempDirectory("graft_coll").toString
    val store = s"$dir/store"
    val (ok, _) = Engine.add(SystemStats.toDataFrame(spark, pts), "h9",
      nowMs = 60000L)
    graft.sources.PointSource.write(ok, store)
    val got = Engine.get(graft.sources.PointSource.read(spark, store),
      Requests.GetRequest("/system/stats/cpu_stats/user{cpu=total}"))
      .select("ts", "dval").collect()
    assert(got.toSeq.map(r => (r.getLong(0), r.getDouble(1))) ==
      Seq((60000L, 10.0)))
    val listed = Engine.list(graft.sources.PointSource.read(spark, store),
      Requests.ListRequest("/system/stats/cpu_stats/*"), nowMs = 60000L)
      .select("name").distinct().collect().map(_.getString(0)).toSet
    assert(listed.contains("/system/stats/cpu_stats/user"))
    assert(listed.contains("/system/stats/cpu_stats/idle"))
  }
}
