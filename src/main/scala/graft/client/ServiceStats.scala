package graft.client

import graft.model.Point

/**
 * Service-status collectors — the remaining reference pollers as pure
 * text→point parsers over each service's standard status output:
 *
 *  - Apache mod_status `?auto` + APC (`client/python/apache_status.py`)
 *  - MySQL `SHOW STATUS` (`client/python/mysql_status.py`)
 *  - `varnishstat -1` (`client/python/varnish_status.py`)
 *
 * The reference pollers fetch/shell out, then parse; only the parse is
 * engine-relevant, so these take the raw text (callers feed an HTTP
 * body or command output) and return canonical points. The SNMP and
 * Cisco pollers (`tools/snmp_hoststats.py`, `cisco_config.py`) stay
 * out of scope: they need live network gear, not a text format.
 */
object ServiceStats {

  private def point(name: String, value: String, labels: Map[String, String],
                    hostname: String, ts: Long): Point = {
    val withHost =
      if (labels.contains("hostname")) labels
      else labels + ("hostname" -> hostname)
    val dv = try Some(value.trim.toDouble) catch { case _: Exception => None }
    Point(name, withHost, graft.model.Variable.Unknown, ts,
      dv, if (dv.isEmpty) Some(value) else None, None)
  }

  /** Scoreboard slot char → worker-state name
    * (apache_status.py:50-63). */
  private val ScoreboardTypes = Map(
    '_' -> "waiting", 'S' -> "starting", 'R' -> "reading", 'W' -> "writing",
    'K' -> "keepalive", 'D' -> "dns", 'C' -> "closing", 'L' -> "logging",
    'G' -> "lameduck", 'I' -> "idle_cleanup", '.' -> "open")

  /**
   * Apache mod_status `?auto` body → `/webserver/apache/...` points:
   * the counter keys the reference maps (apache_status.py:65-90) plus
   * one gauge per scoreboard worker state, ALL states emitted even at
   * zero (apache_status.py:92-93).
   */
  def apacheStats(serverStatusAuto: String, hostname: String, ts: Long): Seq[Point] = {
    val workers = scala.collection.mutable.Map(ScoreboardTypes.values.toSeq.map(_ -> 0L): _*)
    val out = Seq.newBuilder[Point]
    serverStatusAuto.linesIterator.foreach { line =>
      line.split(": ", 2) match {
        case Array(key, value) =>
          key match {
            case "Scoreboard" =>
              value.foreach(c => ScoreboardTypes.get(c)
                .foreach(t => workers(t) += 1L))
            case "Total Accesses" =>
              out += point("/webserver/apache/hits", value, Map.empty, hostname, ts)
            case "Total kBytes" =>
              out += point("/webserver/apache/bytes",
                (value.trim.toDouble * 1024.0).toString,
                Map("units" -> "bytes"), hostname, ts)
            case "CPULoad" =>
              out += point("/webserver/apache/cpu_load", value, Map.empty, hostname, ts)
            case "Uptime" =>
              out += point("/webserver/apache/uptime", value, Map.empty, hostname, ts)
            case "ReqPerSec" =>
              out += point("/webserver/apache/req_per_sec", value, Map.empty, hostname, ts)
            case "BytesPerSec" =>
              out += point("/webserver/apache/bytes_per_sec", value, Map.empty, hostname, ts)
            case "BytesPerReq" =>
              out += point("/webserver/apache/bytes_per_req", value, Map.empty, hostname, ts)
            case "BusyWorkers" | "BusyServers" =>
              out += point("/webserver/apache/busy_workers", value, Map.empty, hostname, ts)
            case "IdleWorkers" | "IdleServers" =>
              out += point("/webserver/apache/idle_workers", value, Map.empty, hostname, ts)
            case _ => ()
          }
        case _ => ()
      }
    }
    workers.toSeq.sortBy(_._1).foreach { case (t, n) =>
      out += point(s"/webserver/apache/worker_slots/$t", n.toString,
        Map.empty, hostname, ts)
    }
    out.result()
  }

  /** APC `apc_info.php?auto` body: every `key: number` pair →
    * `/webserver/apache/apc/<key>` (apache_status.py:96-108). */
  def apcStats(content: String, hostname: String, ts: Long): Seq[Point] =
    "\\w+: [\\d.]+".r.findAllIn(content).toSeq.flatMap { m =>
      m.split(": ", 2) match {
        case Array(k, v) if k.nonEmpty && v.nonEmpty =>
          Seq(point(s"/webserver/apache/apc/$k", v, Map.empty, hostname, ts))
        case _ => Nil
      }
    }

  /**
   * `mysql -e "show status"` output → `/database/mysql/status/<key>`
   * (keys lowercased; ON/OFF → 1/0; non-numeric rows skipped —
   * mysql_status.py:50-73). `port`, when known, becomes a label.
   */
  def mysqlStats(showStatus: String, hostname: String, ts: Long,
                 port: Option[String] = None): Seq[Point] =
    showStatus.linesIterator.flatMap { line =>
      line.trim.split("\\s+", 2) match {
        case Array(rawKey, rawVal) if rawKey.nonEmpty =>
          val key = rawKey.toLowerCase
          val value = rawVal.trim match {
            case "OFF" => "0"
            case "ON" => "1"
            case v => v
          }
          if (scala.util.Try(value.toDouble).isFailure) Nil // skip non-numeric
          else Seq(point(s"/database/mysql/status/$key", value,
            port.map("port" -> _).toMap, hostname, ts))
        case _ => Nil
      }
    }.toSeq

  private val VbePattern = "vbe\\.([^(]+)\\(([^)]+)\\).(.+)".r

  /**
   * `varnishstat -1` output → `/varnish/status/...`
   * (varnish_status.py:38-66): `vbe.<director>(<host>,...,<port>).<stat>`
   * rows become per-backend director stats with backend/backend_port
   * labels; all other keys flatten dots to underscores.
   */
  def varnishStats(varnishstat: String, hostname: String, ts: Long): Seq[Point] =
    varnishstat.linesIterator.flatMap { line =>
      line.trim.split("\\s+", 4) match {
        case Array(rawKey, value, _, _) if rawKey.nonEmpty &&
            scala.util.Try(value.toDouble).isSuccess =>
          rawKey.toLowerCase match {
            case VbePattern(director, backend, stat) =>
              backend.split(",") match {
                case Array(host, _, bport) =>
                  Seq(point(s"/varnish/status/director/$director/$stat", value,
                    Map("backend" -> host, "backend_port" -> bport),
                    hostname, ts))
                case _ => Nil
              }
            case key =>
              Seq(point("/varnish/status/" + key.replace(".", "_"), value,
                Map.empty, hostname, ts))
          }
        case _ => Nil
      }
    }.toSeq
}
