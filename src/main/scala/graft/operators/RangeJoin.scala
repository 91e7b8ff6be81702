package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Range (interval-containment) join — match point rows into interval
 * rows with the same keys and `t_start <= ts <= t_end` (both ends
 * inclusive). The workhorse behind "which alert episode does this
 * sample belong to", "count events inside each session span", and
 * every time-windowed attribution query.
 *
 * Spark plans a raw range predicate as BroadcastNestedLoop (or a
 * sort-merge join on the keys whose per-key matcher still scans every
 * interval per point when one key dominates) — and with NO equality
 * key it degenerates to a cartesian product. This implementation is
 * the standard bucketed decomposition instead:
 *
 *   1. every interval explodes to the `bucketMs`-aligned buckets it
 *      covers (map-side — `explode(sequence(...))`);
 *   2. every point computes its single bucket (map-side arithmetic);
 *   3. ONE equi-join on (keys..., bucket) — hashable, AQE-planable,
 *      skew-splittable like any other shuffle join;
 *   4. the exact `between` filter runs inside the joined stream.
 *
 * A (point, interval) match appears EXACTLY once — the point owns one
 * bucket, and that bucket appears once among the interval's exploded
 * buckets — so no post-join dedup is needed.
 *
 * Scale: the interval side fans out by `ceil(span / bucketMs) + 1`
 * rows; pick `bucketMs` on the order of the TYPICAL interval span so
 * the fan-out stays O(1) per interval while buckets stay narrow
 * enough that a bucket's point×interval product is bounded. Both
 * extremes are visible in the plan (row counts), not silent.
 * Intervals with `t_start > t_end` are dropped (they contain
 * nothing, and `sequence` would reject a negative-length range).
 */
object RangeJoin {

  /**
   * @param points         rows carrying `tsCol` (epoch ms); all columns kept
   * @param intervals      rows carrying `startCol`/`endCol` (epoch ms)
   * @param keys           equality keys present on both sides (may be
   *                       empty: pure containment join, bucket-only
   *                       blocking)
   * @param bucketMs       blocking granularity — on the order of the
   *                       typical interval span
   * @param intervalPrefix prefix for the attached interval columns
   * @return inner join: each matched point row + prefixed interval columns
   */
  def pointsInIntervals(points: DataFrame, intervals: DataFrame,
                        keys: Seq[String], bucketMs: Long,
                        tsCol: String = "ts",
                        startCol: String = "t_start",
                        endCol: String = "t_end",
                        intervalPrefix: String = "iv_"): DataFrame = {
    require(bucketMs > 0, "bucketMs must be positive")
    val payload = intervals.columns.filterNot(keys.contains).toSeq
    require(payload.contains(startCol) && payload.contains(endCol),
      s"intervals must carry non-key $startCol/$endCol columns")
    val attached = payload.map(intervalPrefix + _) :+ "__bucket"
    require(!points.columns.exists(attached.contains),
      s"points already carry a column the join would attach: " +
        s"${points.columns.toSet & attached.toSet}")
    val iv = intervals
      .filter(col(startCol) <= col(endCol))
      .select(keys.map(col) ++ payload.map(c =>
        col(c).as(s"$intervalPrefix$c")): _*)
      .withColumn("__bucket", explode(sequence(
        col(s"$intervalPrefix$startCol") -
          pmod(col(s"$intervalPrefix$startCol"), lit(bucketMs)),
        col(s"$intervalPrefix$endCol") -
          pmod(col(s"$intervalPrefix$endCol"), lit(bucketMs)),
        lit(bucketMs))))
    val pt = points.withColumn("__bucket",
      col(tsCol) - pmod(col(tsCol), lit(bucketMs)))
    pt.join(iv, (keys :+ "__bucket").toSeq)
      .filter(col(tsCol).between(
        col(s"$intervalPrefix$startCol"), col(s"$intervalPrefix$endCol")))
      .drop("__bucket")
  }

  /**
   * Interval×interval overlap join: pairs of `a`/`b` rows with equal
   * keys whose spans intersect (`a.start <= b.end AND b.start <=
   * a.end`, ends inclusive) — span-vs-span attribution (which outages
   * overlapped which deploys; which sessions overlapped which
   * campaigns).
   *
   * Same bucketed decomposition as [[pointsInIntervals]], plus the
   * standard exactly-once trick for the side that now ALSO fans out:
   * two intervals can share many buckets, so the join would emit one
   * row per shared bucket — instead each candidate pair is KEPT only
   * in the FIRST bucket both sides cover
   * (`bucket == max(floor(a.start), floor(b.start))`), which exists
   * for every truly overlapping pair and is unique by construction.
   * Bucket co-occurrence over-approximates overlap (two spans can
   * share a bucket without touching), so the exact predicate still
   * filters the joined stream. No dedup pass, no nested loop.
   */
  def intervalOverlapJoin(a: DataFrame, b: DataFrame, keys: Seq[String],
                          bucketMs: Long,
                          startCol: String = "t_start",
                          endCol: String = "t_end",
                          bPrefix: String = "b_"): DataFrame = {
    require(bucketMs > 0, "bucketMs must be positive")
    require(bPrefix.nonEmpty, "bPrefix must be non-empty — the a side " +
      "keeps bare names, so an empty b prefix would collide")
    val bAttached = b.columns.filterNot(keys.contains).map(bPrefix + _)
      .toSet + "__bucket"
    require(!a.columns.exists(bAttached.contains),
      s"a side already carries a column the join would attach: " +
        s"${a.columns.toSet & bAttached}")
    def exploded(df: DataFrame, prefix: String) = {
      val payload = df.columns.filterNot(keys.contains).toSeq
      df.filter(col(startCol) <= col(endCol))
        .select(keys.map(col) ++ payload.map(c =>
          col(c).as(s"$prefix$c")): _*)
        .withColumn("__bucket", explode(sequence(
          col(s"$prefix$startCol") - pmod(col(s"$prefix$startCol"), lit(bucketMs)),
          col(s"$prefix$endCol") - pmod(col(s"$prefix$endCol"), lit(bucketMs)),
          lit(bucketMs))))
    }
    // `a` keeps bare column names (its payload prefix is empty);
    // callers with colliding schemas set bPrefix to separate them.
    val ae = exploded(a, "")
    val be = exploded(b, bPrefix)
    ae.join(be, (keys :+ "__bucket").toSeq)
      .filter(col("__bucket") === greatest(
        col(startCol) - pmod(col(startCol), lit(bucketMs)),
        col(s"$bPrefix$startCol") - pmod(col(s"$bPrefix$startCol"), lit(bucketMs))))
      .filter(col(startCol) <= col(s"$bPrefix$endCol") &&
        col(s"$bPrefix$startCol") <= col(endCol))
      .drop("__bucket")
  }
}
