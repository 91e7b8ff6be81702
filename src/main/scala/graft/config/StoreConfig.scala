package graft.config

import graft.api.Requests
import graft.operators.{Aggregations, Alerts}
import graft.retention.Retention

/**
 * Typed view over a parsed reference-style store config
 * ([[TextProto]]; reference config.txt + StoreConfig in
 * lib/openinstrument.proto): server addresses, the retention policy
 * (config.txt:22-77 shape), and — engine extension, same syntax — the
 * alert rules the reference leaves to clients.
 *
 * Alert-rule block (same field conventions as retention/mutation
 * blocks; evaluation in [[graft.operators.Alerts]]):
 * {{{
 * alert {
 *   comment: "high event rate"
 *   variable { name: "*" }
 *   aggregation: AVERAGE       # AVERAGE|SUM|MIN|MAX (StreamAggregation enum)
 *   sample_frequency: 3600000  # grid interval, ms
 *   condition: GT              # GT|GE|LT|LE on the gridded value
 *   threshold: 62.0
 *   min_periods: 3             # consecutive violating grid periods
 * }
 * }}}
 */
object StoreConfig {

  final case class Config(
      servers: Seq[String],
      retention: Retention.Policy,
      alerts: Seq[Alerts.AlertRule])

  /** [[parse]] over a UTF-8 config file — the one read-then-parse
    * idiom shared by the CLI (alerts/sweep) and the HTTP server boot. */
  def parseFile(path: String): Config =
    parse(new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      "UTF-8"))

  def parse(text: String): Config = {
    val root = TextProto.parse(text)
    Config(
      servers = root.msgs("server").flatMap(_.str("address")),
      retention = Retention.Policy(
        root.msgs("retention_policy").flatMap(_.msgs("policy")).map(policyItem)),
      alerts = root.msgs("alert").map(alertRule))
  }

  /** `variable { name label{label,value} }` → the matcher's pattern
    * string (`/name{k=v,…}`, [[graft.model.Variable]] syntax). */
  private def variablePattern(v: TextProto.Msg): String = {
    val name = v.str("name").getOrElse("*")
    val labels = v.msgs("label").flatMap(l =>
      for (k <- l.str("label"); value <- l.str("value")) yield s"$k=$value")
    if (labels.isEmpty) name else labels.mkString(s"$name{", ",", "}")
  }

  /** SampleType enum (lib/openinstrument.proto:26-43) → MutationSpec,
    * mirroring the wire codec ([[graft.wire.Rpc]] mutationSpec) so the
    * same rule means the same thing parsed from config.txt or decoded
    * off the wire: `max_gap_interpolate` is a sample COUNT
    * (proto:45-51) converted to ms as count·frequency, and a NONE
    * (interpolate) block without a positive `sample_frequency` is
    * dropped (`Interpolate(0)` would divide by zero; absent max-gap
    * means unlimited fill, the Go server's behavior). */
  private def mutation(m: TextProto.Msg): Option[Requests.MutationSpec] = {
    val freq = m.long("sample_frequency").getOrElse(0L)
    val maxGapMs = m.long("max_gap_interpolate")
      .filter(_ > 0).map(_ * freq).getOrElse(0L)
    m.str("sample_type").getOrElse("NONE") match {
      case "NONE"        =>
        if (freq > 0) Some(Requests.Interpolate(freq, maxGapMs)) else None
      case "AVERAGE"     => Some(Requests.Mean(freq))
      case "MAX"         => Some(Requests.MaxM(freq))
      case "MIN"         => Some(Requests.MinM(freq))
      case "RATE"        => Some(Requests.Rate())
      case "RATE_SIGNED" => Some(Requests.RateSigned())
      case "DELTA"       => Some(Requests.Delta)
      case "LATEST"      => Some(Requests.Latest(freq))
      case other => throw new IllegalArgumentException(s"sample_type $other")
    }
  }

  private def policyItem(p: TextProto.Msg): Retention.PolicyItem =
    Retention.PolicyItem(
      patterns = p.msgs("variable").map(variablePattern),
      policy = p.str("policy").getOrElse("DROP") match {
        case "KEEP" => Retention.Keep
        case "DROP" => Retention.Drop
        case other => throw new IllegalArgumentException(s"policy $other")
      },
      minAgeMs = p.long("min_age").getOrElse(0L),
      maxAgeMs = p.long("max_age").getOrElse(0L),
      mutations = p.msgs("mutation").flatMap(mutation),
      comment = p.strs("comment").mkString(" "))

  private def alertRule(a: TextProto.Msg): Alerts.AlertRule =
    Alerts.AlertRule(
      patterns = a.msgs("variable").map(variablePattern),
      agg = a.str("aggregation").getOrElse("AVERAGE") match {
        case "AVERAGE" => Aggregations.Average
        case "SUM"     => Aggregations.Sum
        case "MIN"     => Aggregations.Min
        case "MAX"     => Aggregations.Max
        // legal per the reference StreamAggregation enum (MEDIAN=3);
        // served by the batch evaluator via Aggregations.Median. The
        // streaming path rejects it at alertRuleStream instead (exact
        // median needs the full window, which streaming state bounds).
        case "MEDIAN"  => Aggregations.Median
        case other => throw new IllegalArgumentException(s"aggregation $other")
      },
      intervalMs = a.long("sample_frequency")
        .getOrElse(Aggregations.DefaultIntervalMs),
      condition = Alerts.Condition(a.str("condition").getOrElse("GT")),
      threshold = a.dbl("threshold").getOrElse(
        throw new IllegalArgumentException("alert rule needs threshold:")),
      minPeriods = a.int("min_periods").getOrElse(1),
      comment = a.strs("comment").mkString(" "))
}
