package graft

import graft.operators.Sessions
import org.apache.spark.sql.functions._

class SessionsSpec extends SparkSpec {
  import spark.implicits._

  test("sessionize: gap > threshold starts a new session, per key") {
    val e = Seq(
      (1L, 0L), (1L, 1000L), (1L, 5000L),   // gaps 1s, 4s
      (1L, 20000L),                          // gap 15s -> new session
      (1L, 21000L),
      (2L, 0L)                               // other key: own session 1
    ).toDF("uid", "ts")
    val got = Sessions.sessionize(e, col("uid"), col("ts"), gapMs = 10000L)
      .select("uid", "ts", "session").as[(Long, Long, Long)]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    assert(got === Seq(
      (1L, 0L, 1L), (1L, 1000L, 1L), (1L, 5000L, 1L),
      (1L, 20000L, 2L), (1L, 21000L, 2L),
      (2L, 0L, 1L)))
  }

  test("sessionize: gap exactly at threshold stays in the session") {
    val e = Seq((1L, 0L), (1L, 10000L)).toDF("uid", "ts")
    val got = Sessions.sessionize(e, col("uid"), col("ts"), gapMs = 10000L)
      .select("session").as[Long].collect().toSet
    assert(got === Set(1L))
  }

  test("asofJoin: latest right row at or before each left ts, per key") {
    val left = Seq(
      (100L, 1L, 50L),   // before any right row -> null
      (101L, 1L, 150L),  // after r@100 -> 100
      (102L, 1L, 200L),  // tie with r@200 -> inclusive, 200
      (103L, 1L, 999L),  // latest right wins -> 200
      (104L, 2L, 500L)   // key 2 has no right rows -> null
    ).toDF("event_id", "uid", "ts")
    val right = Seq((1L, 100L, 10.0), (1L, 200L, 20.0))
      .toDF("uid", "ts", "v")
    val got = graft.operators.AsOf.asofJoin(left, right, Seq("uid"))
      .select(col("event_id"), col("ref_ts"), col("ref_v"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .sortBy(_._1).toSeq
    assert(got === Seq(
      (100L, None, None),
      (101L, Some(100L), Some(10.0)),
      (102L, Some(200L), Some(20.0)),
      (103L, Some(200L), Some(20.0)),
      (104L, None, None)))
  }

  test("asofJoin keeps every left column and row (left semantics)") {
    val left = Seq((1L, 1L, 5L, "x")).toDF("event_id", "uid", "ts", "extra")
    val right = Seq((9L, 99L, 1.0)).toDF("uid", "ts", "v") // other key
    val out = graft.operators.AsOf.asofJoin(left, right, Seq("uid"))
    assert(out.columns.toSet ===
      Set("event_id", "uid", "ts", "extra", "ref_ts", "ref_v"))
    val r = out.collect()
    assert(r.length === 1 && r(0).getAs[String]("extra") === "x"
      && r(0).isNullAt(r(0).fieldIndex("ref_ts")))
  }
}
