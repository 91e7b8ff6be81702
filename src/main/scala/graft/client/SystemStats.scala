package graft.client

import graft.model.Point
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * System-stats collector — the data-producer half of the reference's
 * Python pollers (`client/python/system_status.py:1-276`): scrape
 * /proc + filesystem stats into the canonical point shape, variable
 * names and label conventions preserved (`/system/stats/...`,
 * `datatype=counter|gauge`, per-device/interface labels, forced
 * `hostname` label).
 *
 * Built for testability: every family is a PURE function from the raw
 * text of its /proc file (or command output) to points, so fixtures
 * pin the exact output shape; [[collect]] wires the live files in.
 * Values that fail float parsing export as string points, exactly the
 * reference's AddVar fallback (system_status.py:29-33).
 *
 * Divergences (deliberate, documented):
 *  - USER_HZ is a parameter (default 100, the Linux default) — the JVM
 *    has no portable sysconf(SC_CLK_TCK) (system_status.py:17-18);
 *  - live df stats come from java.nio FileStore totals over local
 *    mounts instead of shelling out to `df -P -l`; the `df` TEXT
 *    parser is still provided ([[dfStats]]/[[dfInodeStats]]) for
 *    feed-through of real df output;
 *  - NTP peer stats are parse-only ([[ntpStats]]) — no ntpq binary is
 *    assumed present.
 */
object SystemStats {

  private def point(name: String, value: String, labels: Map[String, String],
                    hostname: String, ts: Long): Point = {
    val withHost =
      if (labels.contains("hostname")) labels
      else labels + ("hostname" -> hostname)
    // float-parse else string value (system_status.py:29-33)
    val dv = try Some(value.trim.toDouble) catch { case _: Exception => None }
    Point(name, withHost, graft.model.Variable.Unknown, ts,
      dv, if (dv.isEmpty) Some(value) else None, None)
  }

  private def dpoint(name: String, value: Double, labels: Map[String, String],
                     hostname: String, ts: Long): Point =
    point(name, value.toString, labels, hostname, ts)

  private val Counter = Map("datatype" -> "counter")
  private val Gauge = Map("datatype" -> "gauge")

  /** /proc/stat → cpu (per-cpu + total, jiffies ÷ HZ → seconds),
    * interrupts, context switches, uptime, process counts, softirqs
    * (system_status.py:41-89). */
  def cpuStats(procStat: String, hostname: String, ts: Long,
               hz: Double = 100.0, nowSec: Double = 0.0): Seq[Point] =
    procStat.linesIterator.flatMap { line =>
      val trimmed = line.trim
      if (trimmed.isEmpty) Nil
      else {
        val Array(key, rest @ _*) = trimmed.split("\\s+"): @unchecked
        val value = rest.mkString(" ")
        if (key.startsWith("cpu")) {
          val labels = Counter ++ Map("units" -> "seconds",
            "cpu" -> (if (key.length > 3) key.substring(3) else "total"))
          // first 7 fields: user nice system idle iowait irq softirq
          // (newer kernels append steal/guest; ignored like the
          // reference's 8-way split, system_status.py:52-55)
          val f = value.split(" ").take(7).map(_.toDouble / hz)
          if (f.length < 7) Nil
          else Seq("user" -> f(0), "system" -> f(2), "nice" -> f(1),
              "idle" -> f(3), "iowait" -> f(4), "irq" -> f(5),
              "softirq" -> f(6))
            .map { case (n, v) =>
              dpoint(s"/system/stats/cpu_stats/$n", v, labels, hostname, ts) }
        } else key match {
          case "intr" =>
            // total interrupt count only (per-vector export is
            // commented out in the reference too)
            Seq(point("/system/stats/cpu_stats/interrupts",
              value.split(" ").head,
              Counter + ("interrupt" -> "total"), hostname, ts))
          case "ctxt" =>
            Seq(point("/system/stats/cpu_stats/context_switches", value,
              Counter, hostname, ts))
          case "btime" =>
            Seq(dpoint("/system/stats/uptime", nowSec - value.toLong,
              Gauge, hostname, ts))
          case "processes" =>
            Seq(point("/system/stats/processes_started", value, Counter,
              hostname, ts))
          case "procs_blocked" =>
            Seq(point("/system/stats/processes_blocked", value, Gauge,
              hostname, ts))
          case "procs_running" =>
            Seq(point("/system/stats/processes_running", value, Gauge,
              hostname, ts))
          case "softirq" =>
            val counters = value.split(" ")
            point("/system/stats/softirq", counters.head,
              Counter + ("irq" -> "total"), hostname, ts) +:
              counters.tail.zipWithIndex.map { case (c, i) =>
                point("/system/stats/softirq", c,
                  Counter + ("irq" -> i.toString), hostname, ts)
              }.toSeq
          case _ => Nil
        }
      }
    }.toSeq

  /** /proc/loadavg first field (system_status.py:157-160). */
  def loadStats(loadavg: String, hostname: String, ts: Long): Seq[Point] =
    Seq(point("/system/load_average", loadavg.trim.split(" ").head,
      Gauge, hostname, ts))

  /** /proc/sys/kernel/random/entropy_avail (system_status.py:163-167). */
  def entropyStats(text: String, hostname: String, ts: Long): Seq[Point] =
    Seq(point("/system/random/entropy_available", text.trim, Gauge,
      hostname, ts))

  /** /proc/net/dev per-interface counters; fifo depths are gauges
    * (system_status.py:170-199). */
  def interfaceStats(procNetDev: String, hostname: String, ts: Long): Seq[Point] =
    procNetDev.linesIterator.flatMap { raw =>
      val line = raw.trim
      if (!line.matches("^\\s*\\w+:.*")) Nil
      else {
        val f = line.split("\\s+")
        if (f.length < 17) Nil
        else {
          val labels = Counter + ("interface" -> f(0).stripSuffix(":"))
          val counters = Seq(
            "read_bytes" -> f(1), "read_packets" -> f(2),
            "read_errors" -> f(3), "read_drop" -> f(4),
            "read_frame" -> f(6), "read_compressed" -> f(7),
            "read_multicast" -> f(8),
            "write_bytes" -> f(9), "write_packets" -> f(10),
            "write_errors" -> f(11), "write_drop" -> f(12),
            "write_collisions" -> f(14), "write_compressed" -> f(16),
            "write_carrier" -> f(15))
          val gauges = Seq("read_fifo" -> f(5), "write_fifo" -> f(13))
          counters.map { case (n, v) =>
            point(s"/network/interface/stats/$n", v, labels, hostname, ts) } ++
            gauges.map { case (n, v) =>
              point(s"/network/interface/stats/$n", v,
                labels + ("datatype" -> "gauge"), hostname, ts) }
        }
      }
    }.toSeq

  /** /proc/meminfo → bytes; keys lowercased with `(`/`)` → `_`
    * (system_status.py:202-218). */
  def memoryStats(meminfo: String, hostname: String, ts: Long): Seq[Point] =
    meminfo.linesIterator.flatMap { line =>
      line.split(":\\s+", 2) match {
        case Array(rawKey, rawVal) if rawKey.nonEmpty =>
          val key = rawKey.toLowerCase.replaceAll("[()]", "_")
          val m = "^(\\d+) (..)".r.findFirstMatchIn(rawVal.trim)
          try {
            val value = m match {
              case Some(g) if g.group(2) == "kB" => g.group(1).toDouble * 1024.0
              case Some(g) if g.group(2) == "MB" => g.group(1).toDouble * 1024.0 * 1024.0
              case Some(g) => g.group(1).toDouble
              case None => rawVal.trim.toDouble
            }
            Seq(dpoint(s"/system/memory/$key", value, Gauge, hostname, ts))
          } catch {
            // unparseable rows are skipped (system_status.py:217-218)
            case _: NumberFormatException => Nil
          }
        case _ => Nil
      }
    }.toSeq

  /** /proc/vmstat, label-free (system_status.py:237-241). */
  def vmStats(vmstat: String, hostname: String, ts: Long): Seq[Point] =
    vmstat.linesIterator.flatMap { line =>
      line.trim.split(" ") match {
        case Array(key, value) =>
          Seq(point(s"/system/vmstat/$key", value, Map.empty, hostname, ts))
        case _ => Nil
      }
    }.toSeq

  /** /proc/diskstats (the classic 14-field rows); devices with zero
    * reads AND writes are skipped (system_status.py:135-154). */
  def diskStats(diskstats: String, hostname: String, ts: Long): Seq[Point] =
    diskstats.linesIterator.flatMap { line =>
      val f = line.trim.split("\\s+")
      // kernels ≥4.18 append discard/flush fields; the first 14 are stable
      if (f.length < 14) Nil
      else {
        val (name, reads, writes) = (f(2), f(3), f(7))
        if (reads == "0" && writes == "0") Nil
        else {
          val labels = Counter + ("device" -> name)
          Seq("reads" -> reads, "reads_merged" -> f(4),
            "writes" -> writes, "writes_merged" -> f(8),
            "sectors_read" -> f(5), "sectors_written" -> f(9),
            "ms_reading" -> f(6), "ms_writing" -> f(10))
            .map { case (n, v) =>
              point(s"/system/disk_stats/$n", v, labels, hostname, ts) }
        }
      }
    }.toSeq

  /** `df -P -l` text → size/used/available bytes per mount
    * (system_status.py:91-110; 1K blocks × 1024). */
  def dfStats(dfOutput: String, hostname: String, ts: Long): Seq[Point] =
    dfOutput.linesIterator.flatMap { line =>
      line.trim.split("\\s+", 6) match {
        case Array(fs, size, used, avail, _, mount)
            if size.forall(_.isDigit) && size.nonEmpty =>
          val labels = Gauge ++ Map("device" -> fs, "mountpoint" -> mount,
            "units" -> "bytes")
          Seq(dpoint("/system/filesystem/size", size.toDouble * 1024.0, labels, hostname, ts),
            dpoint("/system/filesystem/used", used.toDouble * 1024.0, labels, hostname, ts),
            dpoint("/system/filesystem/available", avail.toDouble * 1024.0, labels, hostname, ts))
        case _ => Nil
      }
    }.toSeq

  /** `df -P -l -i` text → inode totals per mount; zero-inode
    * filesystems skipped (system_status.py:112-132). */
  def dfInodeStats(dfOutput: String, hostname: String, ts: Long): Seq[Point] =
    dfOutput.linesIterator.flatMap { line =>
      line.trim.split("\\s+", 6) match {
        case Array(fs, inodes, used, avail, _, mount)
            if inodes.forall(_.isDigit) && inodes.nonEmpty && inodes != "0" =>
          val labels = Gauge ++ Map("device" -> fs, "mountpoint" -> mount,
            "units" -> "inodes")
          Seq(dpoint("/system/filesystem/inodes_total", inodes.toDouble, labels, hostname, ts),
            dpoint("/system/filesystem/inodes_used", used.toDouble, labels, hostname, ts),
            dpoint("/system/filesystem/inodes_available", avail.toDouble, labels, hostname, ts))
        case _ => Nil
      }
    }.toSeq

  /** `ntpq -n -p` text → delay/offset/jitter seconds for the selected
    * (`*`-marked) peer (system_status.py:221-234). */
  def ntpStats(ntpqOutput: String, hostname: String, ts: Long): Seq[Point] =
    ntpqOutput.linesIterator.flatMap { line =>
      if (!line.startsWith("*")) Nil
      else line.substring(1).trim.split("\\s+") match {
        case f if f.length >= 10 =>
          val labels = Gauge ++ Map("units" -> "seconds", "remote" -> f(0))
          Seq(dpoint("/ntp/delay", f(7).toDouble / 1000.0, labels, hostname, ts),
            dpoint("/ntp/offset", f(8).toDouble / 1000.0, labels, hostname, ts),
            dpoint("/ntp/jitter", f(9).toDouble / 1000.0, labels, hostname, ts))
        case _ => Nil
      }
    }.toSeq

  /** Live filesystem gauges via java.nio — the `df -l` equivalent:
    * local mounts only (device path starts with `/`), read from
    * /proc/mounts. */
  def liveFilesystemStats(hostname: String, ts: Long,
                          mountsText: String): Seq[Point] =
    mountsText.linesIterator.flatMap { line =>
      line.split(" ") match {
        case f if f.length >= 2 && f(0).startsWith("/") =>
          val (dev, mount) = (f(0), f(1).replace("\\040", " "))
          val file = new java.io.File(mount)
          val total = file.getTotalSpace
          if (total <= 0L) Nil
          else {
            val labels = Gauge ++ Map("device" -> dev, "mountpoint" -> mount,
              "units" -> "bytes")
            Seq(dpoint("/system/filesystem/size", total.toDouble, labels, hostname, ts),
              dpoint("/system/filesystem/used",
                (total - file.getFreeSpace).toDouble, labels, hostname, ts),
              dpoint("/system/filesystem/available",
                file.getUsableSpace.toDouble, labels, hostname, ts))
          }
        case _ => Nil
      }
    }.toSeq

  private def readIfPresent(path: String): Option[String] = {
    val p = java.nio.file.Paths.get(path)
    if (java.nio.file.Files.isReadable(p))
      try Some(new String(java.nio.file.Files.readAllBytes(p),
        java.nio.charset.StandardCharsets.UTF_8))
      catch { case _: Exception => None }
    else None
  }

  /**
   * One live scrape — every /proc family that exists on this host,
   * the collector's `main()` body (system_status.py:244-265). Pure
   * parse functions over the live file contents; absent files are
   * skipped (non-Linux hosts yield filesystem stats only).
   */
  def collect(hostname: String = java.net.InetAddress.getLocalHost.getHostName,
              nowMs: Long = System.currentTimeMillis(),
              hz: Double = 100.0): Seq[Point] = {
    val nowSec = nowMs / 1000.0
    readIfPresent("/proc/stat").toSeq.flatMap(cpuStats(_, hostname, nowMs, hz, nowSec)) ++
      readIfPresent("/proc/loadavg").toSeq.flatMap(loadStats(_, hostname, nowMs)) ++
      readIfPresent("/proc/sys/kernel/random/entropy_avail").toSeq
        .flatMap(entropyStats(_, hostname, nowMs)) ++
      readIfPresent("/proc/net/dev").toSeq.flatMap(interfaceStats(_, hostname, nowMs)) ++
      readIfPresent("/proc/meminfo").toSeq.flatMap(memoryStats(_, hostname, nowMs)) ++
      readIfPresent("/proc/vmstat").toSeq.flatMap(vmStats(_, hostname, nowMs)) ++
      readIfPresent("/proc/diskstats").toSeq.flatMap(diskStats(_, hostname, nowMs)) ++
      readIfPresent("/proc/mounts").toSeq
        .flatMap(liveFilesystemStats(hostname, nowMs, _))
  }

  /** Points → canonical point DataFrame (Engine.add / PointSource
    * input shape). */
  def toDataFrame(spark: SparkSession, points: Seq[Point]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(points, 1).map(p =>
        org.apache.spark.sql.Row(p.name, p.labels, p.value_type, p.ts,
          p.dval.map(Double.box).orNull, p.sval.orNull,
          p.end_ts.map(Long.box).orNull)),
      Point.schema)
}
