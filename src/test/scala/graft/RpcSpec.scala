package graft

import graft.api.Requests
import graft.operators.Aggregations
import graft.wire.{Rpc, WireReader}
import org.scalatest.funsuite.AnyFunSuite

/** Pure codec tests: no SparkSession. */
class RpcSpec extends AnyFunSuite {

  test("GetRequest round-trips repeated aggregations in order") {
    val req = Requests.GetRequest(
      variable = "/sys/cpu",
      aggregations = Seq(
        Requests.AggregationSpec(Aggregations.Sum, Nil, 60000L),
        Requests.AggregationSpec(Aggregations.Average, Seq("host"), 30000L),
        Requests.AggregationSpec(Aggregations.Median, Seq("dc"), 10000L)))
    val back = Rpc.decodeGetRequest(Rpc.encodeGetRequest(req))
    assert(back.aggregations == req.aggregations)
  }

  test("WireReader clamps corrupt declared lengths to the buffer") {
    // field 1, wire type 2 (len-delimited), declared length 200 but only
    // 3 payload bytes present — decode must not throw or read past end.
    val w = new graft.wire.WireWriter
    w.tag(1, 2).varint(200L)
    val corrupt = w.result() ++ Array[Byte]('a', 'b', 'c')
    val r = new WireReader(corrupt, 0, corrupt.length)
    var got: String = null
    r.fields {
      case (1, 2) => got = r.string()
      case (_, wt) => r.skip(wt)
    }
    assert(got == "abc")
    assert(!r.hasMore)
  }

  test("WireReader survives truncated fixed64 and skip past end") {
    val w = new graft.wire.WireWriter
    w.tag(2, 1) // fixed64 tag with no payload
    val b = w.result()
    val r = new WireReader(b, 0, b.length)
    r.fields {
      case (2, 1) => assert(r.fixed64() == 0L)
      case (_, wt) => r.skip(wt)
    }
    assert(!r.hasMore)
  }
}
