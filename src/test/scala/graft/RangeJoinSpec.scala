package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def pointsDf = Seq(
    ("u1", 50L, 1.0),   // before every interval
    ("u1", 100L, 2.0),  // == t_start (inclusive)
    ("u1", 150L, 3.0),  // inside
    ("u1", 200L, 4.0),  // == t_end (inclusive)
    ("u1", 201L, 5.0),  // just past
    ("u1", 500L, 6.0),  // inside the second interval
    ("u2", 150L, 7.0)   // right key-range, wrong key
  ).toDF("k", "ts", "v")

  private def intervalsDf = Seq(
    ("u1", "a", 100L, 200L),
    ("u1", "b", 450L, 1450L), // spans many buckets at bucketMs=100
    ("u3", "c", 0L, 1000L),   // key with no points
    ("u1", "bad", 300L, 250L) // inverted: contains nothing, must drop
  ).toDF("k", "tag", "t_start", "t_end")

  test("containment semantics: inclusive ends, key equality, exactly-once matches") {
    val out = RangeJoin.pointsInIntervals(
        pointsDf, intervalsDf, Seq("k"), bucketMs = 100L)
      .select("k", "ts", "v", "iv_tag")
      .as[(String, Long, Double, String)].collect().sortBy(r => (r._2, r._4))
    assert(out.toSeq === Seq(
      ("u1", 100L, 2.0, "a"),
      ("u1", 150L, 3.0, "a"),
      ("u1", 200L, 4.0, "a"),
      ("u1", 500L, 6.0, "b")))
  }

  test("overlapping intervals each match; a point never duplicates within one interval") {
    val iv = Seq(("u1", "x", 0L, 1000L), ("u1", "y", 100L, 300L))
      .toDF("k", "tag", "t_start", "t_end")
    val out = RangeJoin.pointsInIntervals(
        Seq(("u1", 150L)).toDF("k", "ts"), iv, Seq("k"), bucketMs = 50L)
      .select("iv_tag").as[String].collect().sorted
    assert(out.toSeq === Seq("x", "y"))
  }

  test("keyless (pure containment) join blocks on buckets, not a cartesian plan") {
    val pts = Seq((150L, 1.0), (9999L, 2.0)).toDF("ts", "v")
    val iv = Seq(("a", 100L, 200L)).toDF("tag", "t_start", "t_end")
    val out = RangeJoin.pointsInIntervals(pts, iv, Seq.empty, bucketMs = 100L)
    assert(out.select("ts", "iv_tag").as[(Long, String)].collect().toSeq ===
      Seq((150L, "a")))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"),
      s"keyless range join must stay an equi-join on buckets:\n$plan")
  }

  test("overlap join: inclusive-end intersection, exactly once per pair, keys respected") {
    val a = Seq(
      ("u1", "a1", 0L, 1000L),   // spans 11 buckets at bucketMs=100
      ("u1", "a2", 2000L, 2100L),
      ("u2", "a3", 0L, 1000L)
    ).toDF("k", "tag", "t_start", "t_end")
    val b = Seq(
      ("u1", "b1", 500L, 1500L),  // overlaps a1 across 6 shared buckets
      ("u1", "b2", 1000L, 1200L), // touches a1 exactly at its end (inclusive)
      ("u1", "b3", 1101L, 1999L), // gap: overlaps nothing
      ("u3", "b4", 0L, 5000L)     // wrong key
    ).toDF("k", "tag", "t_start", "t_end")
    val out = RangeJoin.intervalOverlapJoin(a, b, Seq("k"), bucketMs = 100L)
      .select("k", "tag", "b_tag")
      .as[(String, String, String)].collect().sorted
    // a1×b1 must appear ONCE despite 6 shared buckets
    assert(out.toSeq === Seq(("u1", "a1", "b1"), ("u1", "a1", "b2")))
  }

  test("overlap join: bucket co-occurrence without true overlap is filtered") {
    val a = Seq(("u1", "a", 0L, 10L)).toDF("k", "tag", "t_start", "t_end")
    val b = Seq(("u1", "b", 90L, 95L)).toDF("k", "tag", "t_start", "t_end")
    // same 100ms bucket, disjoint spans
    assert(RangeJoin.intervalOverlapJoin(a, b, Seq("k"), 100L).count() === 0)
  }

  test("collision guards refuse loudly instead of silently shadowing columns") {
    intercept[IllegalArgumentException]( // points already carry iv_tag
      RangeJoin.pointsInIntervals(
        pointsDf.withColumnRenamed("v", "iv_tag"), intervalsDf, Seq("k"), 100L))
    intercept[IllegalArgumentException]( // empty b prefix would collide
      RangeJoin.intervalOverlapJoin(intervalsDf, intervalsDf, Seq("k"), 100L,
        bPrefix = ""))
    intercept[IllegalArgumentException]( // a already carries b_tag
      RangeJoin.intervalOverlapJoin(
        intervalsDf.withColumnRenamed("tag", "b_tag"), intervalsDf,
        Seq("k"), 100L))
  }

  test("gate-shape plan: equi-join only, no nested loop") {
    val plan = RangeJoin.pointsInIntervals(
        pointsDf, intervalsDf, Seq("k"), bucketMs = 100L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"), plan)
  }
}
