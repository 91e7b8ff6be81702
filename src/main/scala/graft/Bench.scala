package graft
import org.apache.spark.sql.SparkSession
object Bench {
  /**
   * Contamination verdict for a timed window — pure, unit-tested on
   * synthetic and recorded load vectors (BenchSpec), no timed run
   * needed. Three rules, each catching what the others can't:
   *
   *  - entry rule: load above `nprocs/4` BEFORE the window (after the
   *    bounded drain wait) is someone else's by construction;
   *  - hard physical trip: an in-window 1-min load above
   *    `nprocs + nprocs/4` exceeds what this process can generate
   *    alone (a 32-thread bench can't push load much past 32 — r11's
   *    real poisoning read ~50+);
   *  - relative rule (r13 gap): the hard trip is blind to a moderate
   *    neighbor at small SFs where the bench self-loads to only ~4-10
   *    — so any per-query sample exceeding the RUN'S OWN MEDIAN by
   *    more than `nprocs/2` names that query as contaminated. The
   *    margin is nprocs/2, NOT the nprocs/4 entry cap: the bench's own
   *    1-min load ramps over a run (queries sort alphabetically, so
   *    late families sample the built-up steady state), and on the
   *    committed clean r13 sf1 ladder the `ts_asof*` samples sit 9.8
   *    above the run median — a cap-width margin would have flagged a
   *    clean run. At nprocs/2 all three committed r13 artifacts
   *    (sf0.1 / sf1 / sf10, 372 samples) read clean, while an
   *    r11-style poisoning (≥16 external cores) still stands out from
   *    the median at every scale factor; neighbors smaller than that
   *    are left to the per-query [min,max] pass-spread evidence.
   *
   * Returns (contaminated, names of queries tripping the relative rule).
   */
  def contamination(preLoad: Double, qLoads: Seq[(String, Double)],
                    postLoad: Double, nprocs: Int): (Boolean, Seq[String]) = {
    val loadCap = nprocs / 4.0
    val maxWindowLoad = (qLoads.map(_._2) :+ postLoad).max
    val sorted = qLoads.map(_._2).sorted
    val median = if (sorted.isEmpty) 0.0 else sorted(sorted.size / 2)
    val spiky = qLoads.filter(_._2 > median + nprocs / 2.0).map(_._1)
    val contaminated = preLoad > loadCap ||
      maxWindowLoad > nprocs + loadCap || spiky.nonEmpty
    (contaminated, spiky)
  }
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // testdata parquet may flag timestamps isAdjustedToUTC=false; read them
      // as plain TIMESTAMP (session tz is UTC) so unix_millis & friends resolve
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm up session/JIT/codegen + parquet footers so the first timed
    // query isn't charged for one-time init
    try {
      spark.range(1000000L).selectExpr("sum(id)").collect()
      SparkEntry.queries.get("list_vars")
        .foreach(fn => fn(spark, sfDir).queryExecution.toRdd.count())
    } catch { case _: Throwable => }
    // local-iteration filter, like Verify's SPARK_GRAFT_ONLY (unset on
    // the driver → all queries)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    // Bench self-defense: a measurement taken while the box is busy is an
    // artifact poisoner (r11: two stray sf1 oracle processes burned 28/32
    // cores during the driver's window and inflated the total 204.7s vs
    // 143.5s clean). Read the 1-min load BEFORE the first timed pass; if
    // it exceeds nproc/4, wait (bounded) for the box to drain, and carry a
    // machine-visible "contaminated" verdict in the emitted JSON either way.
    def loadAvg(): Double = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    val nprocs = Runtime.getRuntime.availableProcessors
    val loadCap = nprocs / 4.0
    var preLoad = loadAvg()
    val waitDeadline = System.nanoTime() + 300L * 1000000000L // ≤5 min
    while (preLoad > loadCap && System.nanoTime() < waitDeadline) {
      System.err.println(f"[bench] load $preLoad%.1f > cap $loadCap%.1f — waiting for the box to drain")
      Thread.sleep(15000)
      preLoad = loadAvg()
    }
    // deterministic order: stable attribution of warm-cache effects
    // across rounds
    val results = SparkEntry.queries.toSeq
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .sortBy(_._1).map { case (name, fn) =>
      // Two timed passes, report the min: a single pass is hostage to
      // whatever else shares the box (GC, page cache churn, concurrent
      // jobs); the min of two is robust against one-off interference
      // while still charging real per-query work (no caching between
      // passes beyond the JVM/page-cache warmth both passes share).
      // toRdd.count() materializes every output row (a plain .count()
      // lets the optimizer prune all projection work for select-only
      // queries, which would under-measure them)
      var err: Option[String] = None
      // ambient 1-min load sampled as this query's passes START: during
      // a run the average carries the bench's own steady-state (~its
      // parallelism), so the signal is RELATIVE — a spike far above the
      // neighbors' samples attributes partial contamination to exactly
      // the queries it touched (persisted per-query in bench_detail)
      val qLoad = loadAvg()
      val times = (1 to 2).flatMap { _ =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).queryExecution.toRdd.count()
          Some((System.nanoTime() - t0) / 1e9)
        } catch {
          case t: Throwable =>
            // record the failure explicitly — an elapsed-to-crash time
            // must never masquerade as a valid measurement
            err = Some(t.getClass.getSimpleName + ": " +
              Option(t.getMessage).getOrElse("").take(200))
            None
        }
      }
      (name, if (times.nonEmpty) times.min else -1.0, err, times, qLoad)
    }
    def jstr(s: String): String =
      "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
        .replaceAll("[\\n\\r\\t]", " ") + "\""
    // 3 decimals (ms precision) keeps the 100+-entry line compact; more
    // digits are noise at these magnitudes anyway
    def r3(v: Double): Double = math.rint(v * 1000) / 1000
    val qs = results.map { case (k, v, _, _, _) => s"\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e), _, _) => s"\"" + k + "\":" + jstr(e) }
      .mkString("{", ",", "}")
    // BOTH timed passes per query: regression vs noise is decidable
    // from the artifact alone — a real regression moves the min, a
    // noisy neighbor widens the [min,max] spread of one pass
    val passes = results.map { case (k, _, _, ts, _) =>
      s"\"" + k + "\":[" + ts.map(r3).mkString(",") + "]"
    }.mkString("{", ",", "}")
    val total = r3(results.filter(_._3.isEmpty).map(_._2).sum)
    val nErrors = results.count(_._3.isDefined)
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"passes":$passes,"errors":$errs,"sf":"$sfDir"}"""
    println(line)
    val postLoad = r3(loadAvg())
    // three-rule verdict (entry cap, hard physical trip, relative
    // median spike) — rationale + unit coverage at [[contamination]]
    val (contaminated, contamQueries) = contamination(preLoad,
      results.map { case (k, _, _, _, ld) => (k, ld) }, postLoad, nprocs)
    // The harness stdout capture keeps only the output TAIL, which eats
    // the leading ~75 per-query entries of the 180+-query line — so
    // regressions in the families that sort first (agg_*/api_*/d_*/e_*)
    // were invisible round-over-round. Persist the complete map (same
    // JSON line, stable alphabetical key order) to a standalone file
    // that gets committed and diffed per round — EXTENDED with the
    // contamination evidence (run-level load_pre/load_post/contaminated
    // plus the per-query ambient-load samples), so a partially-poisoned
    // window is attributable to the specific queries it touched.
    val loads = results.map { case (k, _, _, _, ld) =>
      s"\"" + k + "\":" + r3(ld)
    }.mkString("{", ",", "}")
    val contamQ = contamQueries.map(jstr).mkString("[", ",", "]")
    val detailLine = line.dropRight(1) +
      s""","loads":$loads,"load_pre":${r3(preLoad)},"load_post":$postLoad,"nproc":$nprocs,"contaminated":$contaminated,"contam_queries":$contamQ}"""
    val detailPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_DETAIL",
      "bench_detail.json")
    try {
      val w = new java.io.PrintWriter(detailPath, "UTF-8")
      try w.println(detailLine) finally w.close()
    } catch {
      case t: Throwable =>
        System.err.println(s"[bench] detail artifact write failed: $t")
    }
    // The harness capturing stdout keeps only the tail of the output; the
    // full line above is ~3 KB and can lose its leading fields to
    // truncation. Repeat the headline numbers on a second, short line so
    // the total is always parseable from the tail. The 1-minute load
    // average + core count make driver-contended runs self-diagnosing:
    // timings taken while the box was busy (load ≫ cores in use) should
    // be discounted rather than read as regressions.
    println(s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},"n_errors":$nErrors,"load_pre":${r3(preLoad)},"load":$postLoad,"nproc":$nprocs,"contaminated":$contaminated,"sf":"$sfDir"}""")
    spark.stop()
  }
}
