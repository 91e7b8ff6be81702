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

  // ---- rule 4 (r16): wall-vs-own-CPU, the loadavg-blind class ----

  test("wall-outlier predicate: 3x factor over canonical plus 0.5s floor") {
    assert(Bench.isWallOutlier(2.2, 0.7))    // 3.1x, above floor
    assert(!Bench.isWallOutlier(2.0, 0.7))   // 2.9x — not an outlier
    assert(!Bench.isWallOutlier(0.45, 0.1))  // 4.5x but under the floor
    assert(Bench.isWallOutlier(35.885, 0.694)) // the r15 rle_encode read
  }

  test("cpuTheft: wall blown with flat own-CPU flags; proportional CPU " +
       "(a genuine regression) passes") {
    val canonWall = Map("g_theft" -> 0.7, "g_regressed" -> 0.7)
    val canonCpu = Map("g_theft" -> 20.0, "g_regressed" -> 20.0)
    // theft: wall 51x canonical, own CPU ~flat (1.1x) — page-cache /
    // IO / starvation signature; loadavg may read anything
    // regression: wall 4x AND cpu 4x — the code really does more work
    val flagged = Bench.cpuTheft(
      Seq(("g_theft", 35.9, 22.0), ("g_regressed", 2.8, 80.0)),
      canonWall, canonCpu)
    assert(flagged == Seq("g_theft"), s"wrong rule-4 verdict: $flagged")
  }

  test("cpuTheft degrades safely: no canonical entry, no CPU sample, " +
       "zero canonicals") {
    val flagged = Bench.cpuTheft(
      Seq(("g_new", 35.9, 22.0),        // no canonical → skip
          ("g_nocpu", 35.9, -1.0),      // platform bean absent → skip
          ("g_zero", 35.9, 22.0)),      // degenerate canonical → skip
      Map("g_nocpu" -> 0.7, "g_zero" -> 0.0),
      Map("g_nocpu" -> 20.0, "g_zero" -> 0.0))
    assert(flagged.isEmpty)
  }

  test("retroactive: the recorded r15 driver window trips rule 4 on " +
       "every inflated gate; a clean gate of the same window passes") {
    // walls: the driver's BENCH_r15 window (shipped contaminated:false
    // under the three loadavg rules) vs the committed ca3fa2a clean
    // canonical. The window recorded no CPU samples — own-CPU here is
    // modeled at canonical scale, which is exactly what the idle
    // re-runs of the same binary measured (0.86-1.9s walls bound
    // own-CPU near canonical; external theft adds wall, not own-CPU).
    val canonWall = Map(
      "rle_encode" -> 0.694, "t_bpe_merges" -> 0.64, "mm_frames" -> 0.196,
      "rle_roundtrip" -> 0.965, "ts_asof" -> 0.955, "p_curate_emb" -> 1.236,
      "ret_policy" -> 1.131, "e_knn_ivf_kmpar" -> 2.93)
    val canonCpu = canonWall.map { case (k, w) => k -> w * 20.0 } // ~20 eff. cores
    val window = Seq(
      ("rle_encode", 35.885, 0.694 * 22), ("t_bpe_merges", 33.643, 0.64 * 22),
      ("mm_frames", 17.94, 0.196 * 22), ("rle_roundtrip", 24.548, 0.965 * 22),
      ("ts_asof", 14.572, 0.955 * 22), ("p_curate_emb", 18.528, 1.236 * 22),
      ("ret_policy", 5.375, 1.131 * 22),
      ("e_knn_ivf_kmpar", 4.348, 2.93 * 22)) // 1.48x canonical: clean
    val flagged = Bench.cpuTheft(window, canonWall, canonCpu).toSet
    assert(flagged == Set("rle_encode", "t_bpe_merges", "mm_frames",
      "rle_roundtrip", "ts_asof", "p_curate_emb", "ret_policy"),
      s"retroactive r15 verdict wrong: $flagged")
  }

  test("medianVsCanonical: flat box-epoch drift reads as the drift factor; " +
       "a single-gate regression leaves the median near 1") {
    val canon = Map("a" -> 1.0, "b" -> 2.0, "c" -> 0.5, "d" -> 4.0, "e" -> 1.5)
    // r16-evening-class drift: every gate ~1.25x -> median IS the drift
    val drifted = Seq("a" -> 1.25, "b" -> 2.5, "c" -> 0.625, "d" -> 5.0,
      "e" -> 1.875)
    assert(math.abs(Bench.medianVsCanonical(drifted, canon) - 1.25) < 1e-9)
    // one real 6x regression on an otherwise-clean box: median stays ~1,
    // so the normalized total still carries the regression
    val regressed = Seq("a" -> 1.0, "b" -> 2.0, "c" -> 0.5, "d" -> 24.0,
      "e" -> 1.5)
    assert(math.abs(Bench.medianVsCanonical(regressed, canon) - 1.0) < 1e-9)
    // degrade: no canonical overlap (bootstrap / sf-mismatch disarm) -> -1
    assert(Bench.medianVsCanonical(Seq("x" -> 1.0), canon) == -1.0)
    assert(Bench.medianVsCanonical(Seq.empty, canon) == -1.0)
    // errored/unmeasured gates (wall <= 0) and zero canonicals are skipped
    assert(math.abs(Bench.medianVsCanonical(
      Seq("a" -> -1.0, "b" -> 2.0), canon + ("b" -> 2.0)) - 1.0) < 1e-9)
  }

  test("parseStringField reads sf; canonical is SF-gated via it") {
    val line = """{"metric":"total","value":1.0,"sf":"/root/testdata/sf0.1"}"""
    assert(Bench.parseStringField(line, "sf").contains("/root/testdata/sf0.1"))
    assert(Bench.parseStringField(line, "nope").isEmpty)
  }

  test("parseFlatDoubleMap reads the writer's own format") {
    val line = """{"metric":"total","value":135.58,"unit":"sec","queries":{"agg_avg":0.421,"rle_encode":0.694},"passes":{"agg_avg":[0.5,0.421]},"cpus":{"agg_avg":8.2,"rle_encode":14.0},"sf":"x"}"""
    assert(Bench.parseFlatDoubleMap(line, "queries") ==
      Map("agg_avg" -> 0.421, "rle_encode" -> 0.694))
    assert(Bench.parseFlatDoubleMap(line, "cpus") ==
      Map("agg_avg" -> 8.2, "rle_encode" -> 14.0))
    assert(Bench.parseFlatDoubleMap(line, "missing").isEmpty)
    assert(Bench.parseFlatDoubleMap("""{"queries":{}}""", "queries").isEmpty)
  }
}
