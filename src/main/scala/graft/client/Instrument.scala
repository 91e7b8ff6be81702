package graft.client

import graft.model.{Point, Variable}
import graft.wire.Rpc
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.util.Base64
import java.util.concurrent.{ConcurrentHashMap, Executors, ScheduledExecutorService, ScheduledFuture, TimeUnit}
import java.util.concurrent.atomic.{AtomicLong, AtomicReference}
import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.jdk.CollectionConverters._

/**
 * Instrumentation library — the data-producer half of the reference's
 * `lib/exported_vars.h:52-226`: process-local counters, ratios,
 * averages, timers and strings that register themselves with a
 * [[VariableExporter]] and are periodically pushed to a store with
 * job/hostname labels stamped on.
 *
 * Semantics mirrored from the reference:
 *  - every exported value snapshots as ONE point at export time with
 *    the current wall-clock timestamp (exported_vars.cc:183-189);
 *  - [[ExportedRatio]] fans out to three integers suffixed `-total` /
 *    `-success` / `-failure` (exported_vars.cc:273-287);
 *  - [[ExportedAverage]] fans out to `-total-count` / `-overall-sum`,
 *    both tagged RATE (exported_vars.cc:291-301) — consumers divide
 *    rate(sum) by rate(count) for a windowed average;
 *  - [[ExportedTimer]] is an average whose sum carries a `units=ms`
 *    label (exported_vars.h:110-118);
 *  - exporter-level extra labels (job, hostname, …) overwrite
 *    per-variable labels at export time (exported_vars.cc:92-97);
 *  - the export loop pushes ALL registered variables in one
 *    AddRequest every N seconds (exported_vars.cc:126-146).
 *
 * Spark-first divergences (deliberate): the export target is either
 * the reference-compatible HTTP+base64 `/add` wire
 * ([[VariableExporter.exportToStore]]) or directly a canonical point
 * DataFrame ([[VariableExporter.toDataFrame]]) for in-process
 * `Engine.add` ingest; the RAII `ScopedExportTimer` becomes the
 * by-name [[ExportedTimer.time]] block plus an explicit
 * [[ExportedTimer.start]]/`TimerContext` for early stop/cancel.
 */
object Instrument {

  /** One registered exported value (exported_vars.h:28-42). */
  sealed trait ExportedVariable {
    def variable: Variable

    /** Snapshot this value as (dval, sval) at export time. */
    private[client] def value(): (Option[Double], Option[String])

    /** One-point wire stream at `nowMs` with `extra` labels stamped
      * over the variable's own (exported_vars.cc:92-97: extra wins). */
    final def exportStream(nowMs: Long,
                           extra: Map[String, String] = Map.empty): Rpc.Stream = {
      val (dv, sv) = value()
      Rpc.Stream(variable.copy(labels = variable.labels ++ extra),
        Seq((nowMs, dv, sv, None)))
    }
  }

  /**
   * Atomic int64 counter/gauge (exported_vars.h:44-68). Exported as a
   * double (the reference lexical-casts the integer,
   * exported_vars.cc:183-189).
   */
  final class ExportedInteger private[client] (
      val variable: Variable,
      initial: Long,
      exporter: VariableExporter) extends ExportedVariable {
    private val counter = new AtomicLong(initial)
    exporter.register(this)

    def set(v: Long): Unit = counter.set(v)
    def inc(): Long = counter.incrementAndGet()
    def dec(): Long = counter.decrementAndGet()
    def add(n: Long): Long = counter.addAndGet(n)
    def get: Long = counter.get()

    private[client] def value(): (Option[Double], Option[String]) =
      (Some(counter.get().toDouble), None)
  }

  object ExportedInteger {
    def apply(name: String, initial: Long = 0L,
              labels: Map[String, String] = Map.empty,
              exporter: VariableExporter = VariableExporter.global): ExportedInteger =
      new ExportedInteger(Variable(name, labels), initial, exporter)
  }

  /**
   * Success/failure ratio — three integers suffixed `-total`,
   * `-success`, `-failure` (exported_vars.h:71-86).
   */
  final class ExportedRatio private (base: Variable, exporter: VariableExporter) {
    private val total =
      new ExportedInteger(base.copy(name = base.name + "-total"), 0L, exporter)
    private val succ =
      new ExportedInteger(base.copy(name = base.name + "-success"), 0L, exporter)
    private val fail =
      new ExportedInteger(base.copy(name = base.name + "-failure"), 0L, exporter)

    def success(): Unit = { total.inc(); succ.inc() }
    def failure(): Unit = { total.inc(); fail.inc() }
    def totals: (Long, Long, Long) = (total.get, succ.get, fail.get)
  }

  object ExportedRatio {
    def apply(name: String, labels: Map[String, String] = Map.empty,
              exporter: VariableExporter = VariableExporter.global): ExportedRatio =
      new ExportedRatio(Variable(name, labels), exporter)
  }

  /**
   * Running average — `-total-count` + `-overall-sum`, both RATE-typed
   * (exported_vars.h:89-104; set_rate at exported_vars.cc:293-294) so
   * the engine's `auto_rate` turns them into windowed averages.
   */
  class ExportedAverage private[client] (
      base: Variable,
      sumLabels: Map[String, String],
      exporter: VariableExporter) {
    private[client] val totalCountVar = new ExportedInteger(
      base.copy(name = base.name + "-total-count", valueType = Variable.Rate),
      0L, exporter)
    private[client] val overallSumVar = new ExportedInteger(
      base.copy(name = base.name + "-overall-sum",
        labels = base.labels ++ sumLabels, valueType = Variable.Rate),
      0L, exporter)

    def update(sum: Long, count: Long = 1L): Unit = {
      totalCountVar.add(count)
      overallSumVar.add(sum)
    }
    def overallSum: Long = overallSumVar.get
    def totalCount: Long = totalCountVar.get
  }

  object ExportedAverage {
    def apply(name: String, labels: Map[String, String] = Map.empty,
              exporter: VariableExporter = VariableExporter.global): ExportedAverage =
      new ExportedAverage(Variable(name, labels), Map.empty, exporter)
  }

  /**
   * Millisecond timer over [[ExportedAverage]]; the sum variable is
   * labeled `units=ms` (exported_vars.h:110-118).
   */
  final class ExportedTimer private (base: Variable, exporter: VariableExporter)
      extends ExportedAverage(base, Map("units" -> "ms"), exporter) {

    /** Record one timed duration. */
    def updateMs(ms: Long): Unit = update(ms, 1L)

    /** Time a block — the ScopedExportTimer happy path
      * (exported_vars.h:121-148). */
    def time[T](f: => T): T = {
      val t0 = System.nanoTime()
      try f
      finally updateMs((System.nanoTime() - t0) / 1000000L)
    }

    /** Explicit context for early [[TimerContext.stop]] /
      * [[TimerContext.cancel]] (ScopedExportTimer stop/cancel). */
    def start(): TimerContext = new TimerContext(this)
  }

  object ExportedTimer {
    def apply(name: String, labels: Map[String, String] = Map.empty,
              exporter: VariableExporter = VariableExporter.global): ExportedTimer =
      new ExportedTimer(Variable(name, labels), exporter)
  }

  /** In-flight timing; records once on first `stop()`, never after
    * `cancel()` (exported_vars.cc:214-233). */
  final class TimerContext private[client] (timer: ExportedTimer) {
    private val t0 = System.nanoTime()
    @volatile private var completed = false
    def stop(): Unit = if (!completed) {
      completed = true
      timer.updateMs((System.nanoTime() - t0) / 1000000L)
    }
    def cancel(): Unit = completed = true
  }

  /** Exported string value (exported_vars.h:212-224). */
  final class ExportedString private (
      val variable: Variable,
      exporter: VariableExporter) extends ExportedVariable {
    private val ref = new AtomicReference[String]("")
    exporter.register(this)
    def set(v: String): Unit = ref.set(v)
    def get: String = ref.get()
    private[client] def value(): (Option[Double], Option[String]) =
      (None, Some(ref.get()))
  }

  object ExportedString {
    def apply(name: String, labels: Map[String, String] = Map.empty,
              exporter: VariableExporter = VariableExporter.global): ExportedString =
      new ExportedString(Variable(name, labels), exporter)
  }

  /**
   * Lazily-created counters under a shared prefix
   * (exported_vars.h:151-167). A variable name is prefixed unless the
   * set has no prefix; exactly one `/` joins the two (the reference
   * intends to trim a trailing prefix slash; its `erase(size-2)`
   * off-by-one drops two chars — not replicated,
   * exported_vars.cc:237-241).
   */
  final class ExportedIntegerSet private (prefix: String, exporter: VariableExporter) {
    private val vars = new ConcurrentHashMap[String, ExportedInteger]()

    def apply(name: String): ExportedInteger = {
      val full =
        if (prefix.isEmpty) { if (name.startsWith("/")) name else s"/$name" }
        else if (name.startsWith("/")) prefix + name
        else s"$prefix/$name"
      vars.computeIfAbsent(full,
        k => new ExportedInteger(Variable(k), 0L, exporter))
    }
  }

  object ExportedIntegerSet {
    def apply(prefix: String = "",
              exporter: VariableExporter = VariableExporter.global): ExportedIntegerSet =
      new ExportedIntegerSet(prefix.reverse.dropWhile(_ == '/').reverse, exporter)
  }
}

/**
 * Registry + export loop for all [[Instrument.ExportedVariable]]s
 * (exported_vars.h:170-208). One process-wide
 * [[VariableExporter.global]] singleton exists, but tests and
 * multi-tenant embedders can construct isolated instances.
 */
final class VariableExporter {
  import Instrument.ExportedVariable

  private val vars = new java.util.concurrent.CopyOnWriteArrayList[ExportedVariable]()
  private val extraLabels = new ConcurrentHashMap[String, String]()
  private val callbacks = new java.util.concurrent.CopyOnWriteArrayList[() => Unit]()
  @volatile private var scheduler: ScheduledExecutorService = null
  @volatile private var task: ScheduledFuture[_] = null

  private[client] def register(v: ExportedVariable): Unit = vars.add(v)

  /** Remove a variable from the export set (the reference does this in
    * ~ExportedVariable; without RAII it's explicit). */
  def unregister(v: ExportedVariable): Boolean = vars.remove(v)
  def size: Int = vars.size()

  /** Labels stamped on every exported variable — job name, hostname
    * (exported_vars.h:196-199). */
  def setExportLabel(k: String, v: String): Unit = extraLabels.put(k, v)
  def clearExportLabel(k: String): Unit = extraLabels.remove(k)

  /** Pre-export hooks, run before every snapshot
    * (exported_vars.h:201, e.g. refreshing gauges). */
  def addExportCallback(f: () => Unit): Unit = callbacks.add(f)

  /** One wire stream per registered variable, extra labels applied. */
  def snapshot(nowMs: Long): Seq[Rpc.Stream] = {
    callbacks.asScala.foreach(_())
    val extra = extraLabels.asScala.toMap
    vars.asScala.map(_.exportStream(nowMs, extra)).toSeq
  }

  /** Text render, one `canonical\tvalue` line per variable
    * (exported_vars.cc:63-88, the /status page body). */
  def exportToString(nowMs: Long): String = {
    val sb = new StringBuilder
    snapshot(nowMs).foreach { s =>
      sb.append(s.variable.canonical).append('\t')
      sb.append(s.values.map { case (_, dv, sv, _) =>
        dv.map(d => if (d == d.floor && !d.isInfinite) d.toLong.toString
                    else d.toString)
          .orElse(sv).getOrElse("")
      }.mkString("\t"))
      sb.append('\n')
    }
    sb.result()
  }

  /** Spark-native export: the snapshot as a canonical point DataFrame,
    * ready for `Engine.add` + `PointSource.write`. */
  def toDataFrame(spark: SparkSession, nowMs: Long): DataFrame = {
    val rows = snapshot(nowMs).flatMap { s =>
      s.values.map { case (ts, dv, sv, ets) =>
        Point(s.variable.name, s.variable.labels, s.variable.valueType,
          ts, dv, sv, ets)
      }
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1)
      .map(p => org.apache.spark.sql.Row(
        p.name, p.labels, p.value_type, p.ts,
        p.dval.map(Double.box).orNull, p.sval.orNull,
        p.end_ts.map(Long.box).orNull)), Point.schema)
  }

  /**
   * Push all variables in one AddRequest to a store's HTTP `/add`
   * endpoint (base64-protobuf wire, exported_vars.cc:89-118). Returns
   * (success, error) — failures are reported, not thrown, matching
   * the reference's log-and-continue export loop.
   */
  def exportToStore(storeUrl: String, nowMs: Long = System.currentTimeMillis())
      : (Boolean, Option[String]) =
    try {
      val body = Rpc.encodeAddRequest(snapshot(nowMs))
      val client = HttpClient.newHttpClient()
      val req = HttpRequest.newBuilder(URI.create(s"$storeUrl/add"))
        .POST(HttpRequest.BodyPublishers.ofByteArray(
          Base64.getEncoder.encode(body)))
        .build()
      val resp = client.send(req, HttpResponse.BodyHandlers.ofByteArray())
      if (resp.statusCode() != 200)
        (false, Some(s"/add -> HTTP ${resp.statusCode()}"))
      else Rpc.decodeAddResponse(Base64.getMimeDecoder.decode(resp.body()))
    } catch {
      case e: Exception => (false, Some(e.toString))
    }

  /** Background export loop (exported_vars.cc:126-146): push every
    * `intervalMs` until [[stopExportThread]]. Daemon-threaded; a
    * failed push is skipped, never fatal. */
  def startExportThread(storeUrl: String, intervalMs: Long): Unit = synchronized {
    if (task != null) return // already running (exported_vars.cc:127-128)
    if (scheduler == null)
      scheduler = Executors.newSingleThreadScheduledExecutor { r =>
        val t = new Thread(r, "graft-var-export"); t.setDaemon(true); t
      }
    task = scheduler.scheduleAtFixedRate(
      () => { exportToStore(storeUrl); () },
      intervalMs, intervalMs, TimeUnit.MILLISECONDS)
  }

  def stopExportThread(): Unit = synchronized {
    if (task != null) { task.cancel(false); task = null }
    if (scheduler != null) { scheduler.shutdown(); scheduler = null }
  }
}

object VariableExporter {
  /** The process-wide default registry (exported_vars.cc:33,120-124). */
  val global: VariableExporter = new VariableExporter
}
