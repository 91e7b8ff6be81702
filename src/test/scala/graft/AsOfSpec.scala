package graft

import graft.operators.AsOf
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def leftDf = Seq(
    ("u1", 100L, 1.0),
    ("u1", 200L, 2.0),
    ("u1", 300L, 3.0),
    ("u2", 150L, 4.0)
  ).toDF("k", "ts", "v")

  private def rightDf = Seq(
    ("u1", 90L, 10.0),
    ("u1", 200L, 20.0), // equal-ts: visible to the left row at 200
    ("u3", 100L, 99.0)  // key with no left rows
  ).toDF("k", "ts", "rv")

  private def collectAsof(df: org.apache.spark.sql.DataFrame): Map[(String, Long), (Option[Long], Option[Double])] =
    df.collect().map { r =>
      (r.getString(0), r.getLong(1)) ->
        ((if (r.isNullAt(3)) None else Some(r.getLong(3))),
         (if (r.isNullAt(4)) None else Some(r.getDouble(4))))
    }.toMap

  test("backward: latest right at-or-before, equal ts matches, missing key nulls") {
    val out = AsOf.asofJoin(leftDf, rightDf, Seq("k"))
      .select("k", "ts", "v", "ref_ts", "ref_rv")
    assert(out.columns.toSeq === Seq("k", "ts", "v", "ref_ts", "ref_rv"))
    val m = collectAsof(out)
    assert(m(("u1", 100L)) === ((Some(90L), Some(10.0))))
    assert(m(("u1", 200L)) === ((Some(200L), Some(20.0)))) // ts >= rts inclusive
    assert(m(("u1", 300L)) === ((Some(200L), Some(20.0))))
    assert(m(("u2", 150L)) === ((None, None))) // no right rows for u2
    assert(m.size === 4) // every left row survives exactly once
  }

  test("backward tolerance nulls out stale matches but keeps the row") {
    val m = collectAsof(AsOf.asofJoin(leftDf, rightDf, Seq("k"), toleranceMs = 50L)
      .select("k", "ts", "v", "ref_ts", "ref_rv"))
    assert(m(("u1", 100L)) === ((Some(90L), Some(10.0)))) // 10ms away: in
    assert(m(("u1", 300L)) === ((None, None)))            // 100ms away: out
    assert(m.size === 4)
  }

  test("forward: earliest right at-or-after") {
    val m = collectAsof(
      AsOf.asofJoin(leftDf, rightDf, Seq("k"), direction = AsOf.Forward)
        .select("k", "ts", "v", "ref_ts", "ref_rv"))
    assert(m(("u1", 100L)) === ((Some(200L), Some(20.0))))
    assert(m(("u1", 200L)) === ((Some(200L), Some(20.0)))) // equal ts matches
    assert(m(("u1", 300L)) === ((None, None)))             // nothing after
  }

  test("nearest: closer side wins, backward wins ties, tolerance folds into choice") {
    val leftN = Seq(("u1", 140L, 1.0), ("u1", 150L, 2.0), ("u1", 260L, 3.0))
      .toDF("k", "ts", "v")
    val rightN = Seq(("u1", 100L, 1.0), ("u1", 200L, 2.0)).toDF("k", "ts", "rv")
    val m = collectAsof(
      AsOf.asofJoin(leftN, rightN, Seq("k"), direction = AsOf.Nearest)
        .select("k", "ts", "v", "ref_ts", "ref_rv"))
    assert(m(("u1", 140L))._1 === Some(100L)) // 40 back vs 60 fwd
    assert(m(("u1", 150L))._1 === Some(100L)) // exact tie: backward wins
    assert(m(("u1", 260L))._1 === Some(200L)) // only backward exists
    // tolerance: a too-far backward candidate must not mask an in-range
    // forward one
    val m2 = collectAsof(
      AsOf.asofJoin(Seq(("u1", 190L, 9.0)).toDF("k", "ts", "v"), rightN,
          Seq("k"), direction = AsOf.Nearest, toleranceMs = 15L)
        .select("k", "ts", "v", "ref_ts", "ref_rv"))
    assert(m2(("u1", 190L))._1 === Some(200L)) // back is 90 away, fwd 10
  }

  test("multi-column keys and multi-column payload ride the struct") {
    val l = Seq(("a", "x", 10L, 1.0)).toDF("k1", "k2", "ts", "v")
    val r = Seq(("a", "x", 5L, 7.0, "meta"), ("a", "y", 6L, 8.0, "other"))
      .toDF("k1", "k2", "ts", "rv", "tag")
    val row = AsOf.asofJoin(l, r, Seq("k1", "k2")).collect().head
    assert(row === Row("a", "x", 10L, 1.0, 5L, 7.0, "meta"))
  }

  test("column-collision and missing-key guards refuse loudly") {
    intercept[IllegalArgumentException]( // left already has ref_ts
      AsOf.asofJoin(leftDf.withColumnRenamed("v", "ref_ts"), rightDf, Seq("k")))
    intercept[IllegalArgumentException]( // internal scratch column
      AsOf.asofJoin(leftDf.withColumnRenamed("v", "__ts"), rightDf, Seq("k")))
    intercept[IllegalArgumentException]( // key absent on the right
      AsOf.asofJoin(leftDf, rightDf.withColumnRenamed("k", "kk"), Seq("k")))
    intercept[IllegalArgumentException]( // no keys at all
      AsOf.asofJoin(leftDf, rightDf, Seq.empty))
  }

  test("plan: no join operator, exactly one shuffle on the keys") {
    val plan = AsOf.asofJoin(leftDf, rightDf, Seq("k"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"asofJoin must not plan a join:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges === 1, s"expected one key shuffle, got $exchanges:\n$plan")
  }
}
