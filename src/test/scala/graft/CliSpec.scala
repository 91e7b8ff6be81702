package graft

import graft.cli.Cli
import graft.sources.PointSource
import org.apache.spark.sql.functions._

class CliSpec extends SparkSpec {

  test("duration grammar (lib/timer.h:178-194)") {
    assert(Cli.parseDuration("5m") == 300000L)
    assert(Cli.parseDuration("1h") == 3600000L)
    assert(Cli.parseDuration("12h") == 43200000L)
    assert(Cli.parseDuration("300s") == 300000L)
    assert(Cli.parseDuration("250ms") == 250L)
    assert(Cli.parseDuration("2d") == 172800000L)
    intercept[IllegalArgumentException](Cli.parseDuration("x5m"))
  }

  test("get argument language compiles to the right request") {
    val req = Cli.parseGet("/sys/cpu{host=*}",
      Seq("rate", "mean=5m", "agg=sum", "interval=30s", "aggregate=host",
        "max_values=10"))
    assert(req.mutations.length == 2)
    assert(req.aggregations.exists(a =>
      a.labels == Seq("host") && a.sampleIntervalMs == 30000L))
    assert(req.maxValues.contains(10))
  }

  test("get args: ewma and anomaly mutations parse with durations") {
    val req = Cli.parseGet("/sys/cpu", Seq("ewma=10m", "anomaly=1h"))
    assert(req.mutations == Seq(
      graft.api.Requests.Ewma(600000L), graft.api.Requests.Anomaly(3600000L)))
  }

  test("get args: repeated aggregates, auto_rate, independent") {
    val req = Cli.parseGet("/sys/cpu", Seq(
      "mean=5m", "max=5m", "independent", "auto_rate",
      "agg=sum", "aggregate=name", "agg=avg", "interval=1m", "aggregate=host"))
    assert(!req.chainMutations && req.autoRate)
    assert(req.aggregations.map(a => (a.agg, a.labels)) == Seq(
      (graft.operators.Aggregations.Sum, Nil),
      (graft.operators.Aggregations.Average, Seq("host"))))
    assert(req.aggregations(1).sampleIntervalMs == 60000L)
  }

  test("end-to-end: add, get with mutation, list against a store") {
    val store = java.nio.file.Files.createTempDirectory("graft_cli").toString + "/s"
    val added = Cli.runAdd(spark, store, Seq(
      "/cli/counter{host=a}:10@1000", "/cli/counter{host=a}:30@2000",
      "/cli/counter{host=a}:60@3000", "/cli/other:5@1000"),
      nowMs = 10000L)
    assert(added == 4)
    val got = Cli.run(spark, store,
      Seq("get", "/cli/counter{host=a}", "rate"))
      .select("ts", "dval").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
    assert(got == Seq((2000L, 20.0), (3000L, 30.0)))
    val listed = Cli.run(spark, store, Seq("list", "/cli/*", "max_age=1y"),
      nowMs = 10000L)
    assert(listed.count() == 2)
  }
}
