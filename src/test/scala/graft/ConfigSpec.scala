package graft

import graft.config.{StoreConfig, TextProto}
import graft.retention.Retention
import org.scalatest.funsuite.AnyFunSuite

/** Text-proto config parsing (reference config.txt shape) and the
  * typed StoreConfig mapping: servers, retention policy, alert rules. */
class ConfigSpec extends AnyFunSuite {

  // structurally mirrors /root/reference/config.txt:1-77 (servers +
  // first-match retention_policy with DROP / KEEP / downsample items)
  private val refStyle =
    """server { address: "192.168.1.5:8020" }
      |server { address: "192.168.1.6:8020" }
      |# first-match retention
      |retention_policy {
      |  policy {
      |    comment: "never used, drop"
      |    variable { name: "/proc/cpuset" }
      |    policy: DROP
      |  }
      |  policy {
      |    comment: "keep forever at original resolution"
      |    variable {
      |      name: "*"
      |      label {
      |        label: "retain"
      |        value: "forever"
      |      }
      |    }
      |    policy: KEEP
      |  }
      |  policy {
      |    comment: "daily latest after a week"
      |    variable: { name: "/proc/os-name" }
      |    variable: { name: "/proc/os-arch" }
      |    policy: KEEP
      |    min_age: 604800000
      |    max_age: 157680000000
      |    mutation {
      |      sample_type: LATEST
      |      sample_frequency: 86400000
      |    }
      |  }
      |  # default: drop
      |}
      |alert {
      |  comment: "cpu hot"
      |  variable { name: "/proc/cpu*" }
      |  aggregation: MAX
      |  sample_frequency: 60000
      |  condition: GE
      |  threshold: 95.5
      |  min_periods: 5
      |}""".stripMargin

  test("tokenizer/parser: blocks, optional colon, quotes, comments, repeats") {
    val m = TextProto.parse(refStyle)
    assert(m.msgs("server").flatMap(_.str("address")) ==
      Seq("192.168.1.5:8020", "192.168.1.6:8020"))
    val policies = m.msgs("retention_policy").head.msgs("policy")
    assert(policies.length == 3)
    // `variable: { ... }` (with colon) parses the same as `variable { ... }`
    assert(policies(2).msgs("variable").flatMap(_.str("name")) ==
      Seq("/proc/os-name", "/proc/os-arch"))
    // quoted strings keep ':' and '#' intact
    assert(m.msgs("server").head.str("address").get.contains(":"))
  }

  test("parser rejects malformed input") {
    intercept[IllegalArgumentException](TextProto.parse("a { b: 1"))
    intercept[IllegalArgumentException](TextProto.parse("a } b"))
    intercept[IllegalArgumentException](TextProto.parse("a"))
    intercept[IllegalArgumentException](TextProto.parse("threshold:"))
    // unterminated quotes and dangling escapes error instead of
    // silently consuming to EOF
    intercept[IllegalArgumentException](TextProto.parse("""c: "unclosed"""))
    intercept[IllegalArgumentException](TextProto.parse("c: \"half\\"))
  }

  test("quoted strings translate standard TextFormat escapes") {
    val m = TextProto.parse("""c: "line\nnext\ttab \"q\" back\\slash"""" )
    assert(m.str("c").contains("line\nnext\ttab \"q\" back\\slash"))
  }

  test("MEDIAN alert aggregation parses (batch-served)") {
    val cfg = """alert { variable: "/m/x" aggregation: MEDIAN
                |  threshold: 5.0 }""".stripMargin
    val Seq(rule) = StoreConfig.parse(cfg).alerts
    assert(rule.agg == graft.operators.Aggregations.Median)
    // the streaming evaluator refuses it up front — exact medians need
    // the full window; the batch path (Alerts.evaluate) serves it.
    // (The agg check precedes any plan construction, so no session is
    // needed here.)
    intercept[IllegalArgumentException](
      graft.streaming.StreamIngest.alertRuleStream(null, rule))
  }

  test("mutation units mirror the wire codec: gap in samples, freq guard") {
    // max_gap_interpolate is a sample COUNT (proto:45-51): 2 samples at
    // 30 s frequency = 60 000 ms of fill cap, exactly like Rpc decode
    val cfg = StoreConfig.parse(
      """retention_policy { policy {
        |  variable { name: "*" }
        |  policy: KEEP
        |  mutation { sample_type: NONE sample_frequency: 30000 max_gap_interpolate: 2 }
        |  mutation { sample_type: NONE }
        |} }""".stripMargin)
    // the freq-less NONE block is dropped (Interpolate(0) would divide
    // by zero; Rpc.mutationSpec makes the same call)
    assert(cfg.retention.items.head.mutations ==
      Seq(graft.api.Requests.Interpolate(30000L, 60000L)))
  }

  test("StoreConfig maps retention policy items (first-match order kept)") {
    val cfg = StoreConfig.parse(refStyle)
    assert(cfg.servers == Seq("192.168.1.5:8020", "192.168.1.6:8020"))
    val items = cfg.retention.items
    assert(items.map(_.policy) == Seq(Retention.Drop, Retention.Keep, Retention.Keep))
    assert(items(0).patterns == Seq("/proc/cpuset"))
    assert(items(1).patterns == Seq("*{retain=forever}"))
    assert(items(2).minAgeMs == 604800000L && items(2).maxAgeMs == 157680000000L)
    assert(items(2).mutations == Seq(graft.api.Requests.Latest(86400000L)))
  }

  test("StoreConfig maps alert rules") {
    val Seq(rule) = StoreConfig.parse(refStyle).alerts
    assert(rule.patterns == Seq("/proc/cpu*"))
    assert(rule.agg == graft.operators.Aggregations.Max)
    assert(rule.intervalMs == 60000L)
    assert(rule.condition == graft.operators.Alerts.Ge)
    assert(rule.threshold == 95.5 && rule.minPeriods == 5)
    assert(rule.comment == "cpu hot")
  }

  test("parsed retention policy drives Retention.apply like a hand-built one") {
    val cfg = StoreConfig.parse(
      """retention_policy {
        |  policy {
        |    variable { name: "/drop/*" }
        |    policy: DROP
        |  }
        |  policy {
        |    variable { name: "*" }
        |    policy: KEEP
        |    max_age: 1000000
        |  }
        |}""".stripMargin)
    // first-match: /drop/x dies on item 0; fresh /keep/x survives item 1;
    // anything older than max_age falls through -> default DROP
    val idx0 = Retention.policyIndex(cfg.retention, nowMs = 500000L)
    assert(cfg.retention.items.length == 2)
    assert(cfg.retention.items(1).maxAgeMs == 1000000L)
    // plumbing sanity only (full engine behavior is RetentionSpec's job)
    assert(idx0 != null)
  }

  test("m_alert's rule text parses to the gate's exact parameters") {
    val Seq(rule) = StoreConfig.parse(SparkEntry.AlertConfigText).alerts
    assert(rule.threshold == 62.0 && rule.minPeriods == 3 &&
      rule.intervalMs == 3600000L &&
      rule.agg == graft.operators.Aggregations.Average &&
      rule.condition == graft.operators.Alerts.Gt)
  }
}
