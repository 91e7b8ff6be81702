package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * Unit coverage for the bench's contamination predicate — pure function,
 * no timed run needed. The synthetic vectors model the three recorded
 * regimes (r13 sf0.1 / sf1 / sf10 load shapes, BASELINE.md bench canon)
 * plus the failure modes each rule exists for: r11's 28-core poisoning
 * (hard physical trip), a dirty entry (entry cap), and the r13 gap — a
 * moderate external burn starting mid-window at a small SF, invisible
 * to the physical bound but far above the run's own median.
 */
class BenchSpec extends AnyFunSuite {

  private val N = 32 // the bench box's core count in all recorded canon

  private def loads(vs: Double*): Seq[(String, Double)] =
    vs.zipWithIndex.map { case (v, i) => (f"q$i%03d", v) }

  test("clean small-sf run (r13 sf0.1 shape): low flat samples, clean exit") {
    val (c, spiky) = Bench.contamination(
      preLoad = 3.0, loads(2.5, 2.9, 3.1, 2.7, 4.0, 6.3, 3.0), 4.4, N)
    assert(!c && spiky.isEmpty)
  }

  test("clean sf1 ladder shape: ramp puts late samples ~10 above the median") {
    // the recorded r13 sf1 ladder: median 5.6, ts_asof* samples 14-15.4
    // — a cap-width (nprocs/4) relative margin would false-positive
    // exactly here; the nprocs/2 margin must not
    val (c, spiky) = Bench.contamination(
      preLoad = 1.1,
      loads(1.5, 2.0, 3.0, 4.5, 5.6, 6.0, 8.2, 11.0, 14.0, 14.9, 15.4),
      13.2, N)
    assert(!c && spiky.isEmpty, s"clean ramp flagged: $spiky")
  }

  test("clean sf10 run: self-load near nprocs is not contamination") {
    // r12-era `post > nproc/2` false-positived here; neither the hard
    // trip (max 30.4 < 40) nor the relative rule (median ≈ 23.6) may fire
    val (c, spiky) = Bench.contamination(
      preLoad = 3.2, loads(8.0, 15.0, 22.0, 23.5, 23.6, 24.0, 26.0, 30.4),
      27.8, N)
    assert(!c && spiky.isEmpty)
  }

  test("dirty entry trips regardless of in-window samples") {
    val (c, spiky) = Bench.contamination(
      preLoad = 12.0, loads(3.0, 3.0, 3.0), 3.0, N)
    assert(c && spiky.isEmpty)
  }

  test("hard physical trip: r11-style full poisoning (load ≫ nprocs)") {
    val (c, _) = Bench.contamination(
      preLoad = 2.0, loads(10.0, 30.0, 52.0, 48.0), 45.0, N)
    assert(c)
  }

  test("relative rule: mid-window 20-core neighbor at small sf is named") {
    // the r13 gap: bench self-loads ~3, neighbor pushes samples to ~24
    // — under the old physical-only bound (40) this read as clean
    val qs = loads(2.5, 3.0, 2.8, 24.0, 23.5, 3.1, 2.9)
    val (c, spiky) = Bench.contamination(preLoad = 2.0, qs, 3.5, N)
    assert(c, "moderate mid-window neighbor must contaminate")
    assert(spiky == Seq("q003", "q004"), s"wrong attribution: $spiky")
  }

  test("sub-threshold neighbor stays clean (left to pass-spread evidence)") {
    // +14 over median is under the nprocs/2 margin by design
    val (c, spiky) = Bench.contamination(
      preLoad = 2.0, loads(2.5, 3.0, 2.8, 17.0, 3.1), 3.5, N)
    assert(!c && spiky.isEmpty)
  }

  test("empty run degenerates safely") {
    val (c, _) = Bench.contamination(0.5, Nil, 0.5, N)
    assert(!c)
  }
}
