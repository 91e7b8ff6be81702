package graft

import graft.model.Point
import graft.operators.Mutations

/**
 * Golden vectors ported from the reference test suite:
 *  - go/.../mutations/mutations_test.go:20-74 (Mean, Interpolate)
 *  - lib/counter_test.cc:28-58 (UniformTimeSeries)
 */
class MutationsSpec extends SparkSpec {

  // mutations_test.go:20-34 — uniform series
  val uniform: Seq[(Long, Double)] = Seq(
    0L -> 20.0, 60L -> 40.0, 120L -> 60.0, 180L -> 80.0, 240L -> 100.0,
    300L -> 120.0, 330L -> 130.0, 360L -> 140.0, 420L -> 160.0,
    480L -> 180.0, 540L -> 200.0)

  // mutations_test.go:36-48 — irregular series
  val offset: Seq[(Long, Double)] = Seq(
    0L -> 20.0, 61L -> 40.0, 122L -> 60.0, 185L -> 80.0, 241L -> 100.0,
    299L -> 122.0, 330L -> 132.0, 359L -> 140.0, 421L -> 160.0,
    488L -> 180.0, 540L -> 200.0, 975L -> 275.0)

  def keyed(pts: Seq[(Long, Double)]) = Point.withSeriesKey(series(pts))

  test("LTTB(10) golden: anchor, per-bucket max-area vs next centroid, endpoint") {
    // anchor (1,0); bucket 1 = {(12,1),(14,10),(18,2)} with next
    // centroid (25,4): areas |−24v+4(ts−1)| = 20/188/20 → (14,10);
    // bucket 2 = {(25,4)} sole candidate; bucket 3 last → endpoint.
    val pts = Seq(1L -> 0.0, 12L -> 1.0, 14L -> 10.0, 18L -> 2.0,
      25L -> 4.0, 33L -> 7.0)
    assert(collectTsVal(Mutations.lttb(keyed(pts), 10L)) ===
      Seq(1L -> 0.0, 14L -> 10.0, 25L -> 4.0, 33L -> 7.0))
  }

  test("LTTB(10): equal areas tie to the earliest ts; anchor-only passes through") {
    // px=(0,0), next centroid (20,0): area = 20·|v| → (11,3) and
    // (12,-3) tie at 60; earliest wins.
    val pts = Seq(0L -> 0.0, 11L -> 3.0, 12L -> -3.0, 20L -> 0.0)
    assert(collectTsVal(Mutations.lttb(keyed(pts), 10L)) ===
      Seq(0L -> 0.0, 11L -> 3.0, 20L -> 0.0))
    assert(collectTsVal(Mutations.lttb(keyed(Seq(7L -> 42.0)), 10L)) ===
      Seq(7L -> 42.0))
  }

  test("Mean(300) golden: buckets anchored at first input ts, emitted at last ts") {
    val got = collectTsVal(Mutations.meanExact(keyed(uniform), 300L))
    assert(got === Seq(300L -> 70.0, 540L -> 162.0))
  }

  test("Interpolate(300) golden: grid-aligned with bracket skipping") {
    val got = collectTsVal(Mutations.interpolate(keyed(offset), 300L))
    assert(got.map(_._1) === Seq(0L, 300L, 600L, 900L))
    val expected = Seq(20.0, 121.81818181818181, 191.86046511627907, 258.37209302325584)
    got.map(_._2).zip(expected).foreach { case (g, e) => assert(math.abs(g - e) < 1e-9) }
  }

  test("UniformTimeSeries(60) golden: 12 irregular points -> 15 exact grid points") {
    val input = Seq(0L -> 10.0, 1L -> 10.0, 30L -> 60.0, 41L -> 70.0,
      70L -> 130.0, 130L -> 280.0, 190L -> 460.0, 240L -> 460.0,
      250L -> 710.0, 305L -> 840.0, 470L -> 1034.0, 900L -> 1630.0)
    val got = collectTsVal(Mutations.resampleUniform(keyed(input), 60L))
    val expected = Seq(
      60L -> 109.31034482758622, 120L -> 255.0, 180L -> 430.0, 240L -> 460.0,
      300L -> 828.1818181818181, 360L -> 904.6666666666666,
      420L -> 975.2121212121212, 480L -> 1047.860465116279,
      540L -> 1131.0232558139535, 600L -> 1214.186046511628,
      660L -> 1297.3488372093022, 720L -> 1380.5116279069767,
      780L -> 1463.6744186046512, 840L -> 1546.8372093023254, 900L -> 1630.0)
    assert(got.map(_._1) === expected.map(_._1))
    got.zip(expected).foreach { case ((_, g), (_, e)) => assert(math.abs(g - e) < 1e-4) }
  }

  test("Rate drops negatives (counter reset), SignedRate keeps them") {
    val pts = Seq(0L -> 0.0, 1000L -> 10.0, 2000L -> 5.0, 3000L -> 20.0)
    val r = collectTsVal(Mutations.rate(keyed(pts), perSecond = true))
    assert(r === Seq(1000L -> 10.0, 3000L -> 15.0))
    val s = collectTsVal(Mutations.rateSigned(keyed(pts), perSecond = true))
    assert(s === Seq(1000L -> 10.0, 2000L -> -5.0, 3000L -> 15.0))
  }

  test("Delta is consecutive difference with negatives dropped (C++ semantics)") {
    val pts = Seq(0L -> 5.0, 10L -> 8.0, 20L -> 2.0, 30L -> 12.0)
    val d = collectTsVal(Mutations.delta(keyed(pts)))
    assert(d === Seq(10L -> 3.0, 30L -> 10.0))
  }

  test("Min/Max exact: emit previous window extremum at next window's first ts") {
    // window [0..299] from anchor 0: values 1,5,3 -> min 1 max 5, emitted at 300
    val pts = Seq(0L -> 1.0, 100L -> 5.0, 200L -> 3.0, 300L -> 2.0, 400L -> 9.0)
    assert(collectTsVal(Mutations.minExact(keyed(pts), 300L)) === Seq(300L -> 1.0))
    assert(collectTsVal(Mutations.maxExact(keyed(pts), 300L)) === Seq(300L -> 5.0))
  }

  test("grid fast path: mean over floor-aligned buckets, emitted at last input ts") {
    val got = collectTsVal(Mutations.meanGrid(keyed(uniform), 300L))
    // buckets [0,300): 20..100 mean 60 @240; [300,600): 120..200 mean 155 @540
    assert(got === Seq(240L -> 60.0, 540L -> 155.0))
  }

  test("EWMA: first point emits itself; constant series stays constant") {
    val const = Seq(0L -> 5.0, 100L -> 5.0, 5000L -> 5.0)
    val got = collectTsVal(Mutations.ewma(keyed(const), 1000.0))
    assert(got.map(_._1) === const.map(_._1))
    got.map(_._2).foreach(v => assert(v === 5.0))
  }

  test("EWMA: α = 1 − exp(−Δt/τ), and a wide gap re-anchors to the new value") {
    val pts = Seq(0L -> 0.0, 100L -> 10.0, 1000000L -> 42.0)
    val got = collectTsVal(Mutations.ewma(keyed(pts), 1000.0))
    val a1 = 1.0 - math.exp(-0.1)
    assert(math.abs(got(1)._2 - a1 * 10.0) < 1e-12)
    // Δt = 1000·τ ⇒ α ≈ 1: the smoother forgets everything before the gap
    assert(math.abs(got(2)._2 - 42.0) < 1e-9)
  }

  test("multiple series are mutated independently") {
    val a = series(uniform, "/a")
    val b = series(uniform.map { case (t, v) => (t, v * 2) }, "/b")
    val both = Point.withSeriesKey(a.union(b))
    val got = Mutations.meanExact(both, 300L).collect()
    assert(got.length === 4)
  }

  test("slidingGrid: trailing window rolls bucket partials, sparse gaps stay correct") {
    import graft.operators.Aggregations
    // hop 100, width 300 (3 buckets); buckets 0, 100, 400 observed —
    // bucket 400's window [200, 500) must NOT see bucket 0/100 (gap)
    val pts = Seq(0L -> 1.0, 50L -> 3.0, 150L -> 10.0, 420L -> 7.0)
    val got = Mutations.slidingGrid(keyed(pts), 300L, 100L, Aggregations.Average)
      .select("ts", "dval", "n").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).sortBy(_._1)
    assert(got.toSeq === Seq(
      (0L, 2.0, 2L),            // [−200, 100): pts at 0, 50
      (100L, 14.0 / 3, 3L),     // [−100, 200): 0, 50, 150
      (400L, 7.0, 1L)))         // [200, 500): only 420 — gap respected
    val mx = Mutations.slidingGrid(keyed(pts), 300L, 100L, Aggregations.Max)
      .select("ts", "dval").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    assert(mx.toSeq === Seq((0L, 3.0), (100L, 10.0), (400L, 7.0)))
  }

  test("Holt: constant series is a fixed point; a wide gap re-anchors") {
    val c = collectTsVal(Mutations.holt(
      keyed(Seq(0L -> 5.0, 100L -> 5.0, 250L -> 5.0)), 1000.0, 3000.0))
    c.foreach { case (_, v) => assert(v === 5.0) }
    // gap of 1000·τ: α,γ ≈ 1 — the smoother forgets the old level
    val g = collectTsVal(Mutations.holt(
      keyed(Seq(0L -> 0.0, 100L -> 0.0, 1000000L -> 42.0)), 1000.0, 3000.0))
    assert(math.abs(g.last._2 - 42.0) < 1e-9)
  }

  test("Holt tracks a ramp closer than EWMA (the trend term's whole point)") {
    val ramp = (0 to 20).map(i => (i * 100L, i * 10.0))
    val hv = collectTsVal(Mutations.holt(keyed(ramp), 300.0, 300.0)).last._2
    val ev = collectTsVal(Mutations.ewma(keyed(ramp), 300.0)).last._2
    val actual = ramp.last._2
    assert(math.abs(hv - actual) < math.abs(ev - actual),
      s"holt=$hv ewma=$ev actual=$actual")
  }

  test("Holt duplicate timestamp leaves state untouched and re-emits the level") {
    val op = new Mutations.HoltOp(1000.0, 3000.0)
    op.feed(0L, 1.0)
    val l1 = op.feed(100L, 2.0).head._2
    val dup = op.feed(100L, 99.0).head._2 // wild duplicate: no state change
    assert(dup === l1)
    assert(!op.feed(200L, 2.0).head._2.isNaN) // and the chain continues
  }

  test("slidingGrid refuses median and non-multiple widths") {
    import graft.operators.Aggregations
    val df = keyed(Seq(0L -> 1.0))
    intercept[IllegalArgumentException](
      Mutations.slidingGrid(df, 300L, 100L, Aggregations.Median))
    intercept[IllegalArgumentException](
      Mutations.slidingGrid(df, 250L, 100L, Aggregations.Average))
  }
}
