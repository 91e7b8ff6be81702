package graft.retention

import graft.api.Requests.MutationSpec
import graft.model.Point
import graft.pattern.VariableMatcher
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Retention policy engine (reference: `RetentionPolicy`,
 * lib/openinstrument.proto:195-212; first-match evaluation
 * lib/retention_policy_manager.cc:20-63; background apply loop
 * server/store_file_manager.cc:87-191; example policy config.txt:22-77).
 *
 * A policy is an ordered list of items; the first item whose variable
 * patterns AND age window match a point decides its fate:
 *  - DROP → point removed;
 *  - KEEP (no mutations) → point kept as-is;
 *  - KEEP + mutations → point downsampled through the §2.1 mutation
 *    chain (e.g. "daily LATEST after a week", config.txt:48-51).
 * No item matching → DROP (the reference's default,
 * retention_policy_manager.cc:59-62).
 *
 * Spark shape: policy selection is a single codegen'd when-chain (one
 * scan, no shuffle); only policies that downsample induce their
 * mutation's own aggregation. This is the scheduled Parquet-partition
 * rewrite job of SURVEY.md §2.3 — at scale it runs per date partition
 * and rewrites files in place.
 */
object Retention {

  sealed trait PolicyType
  case object Keep extends PolicyType
  case object Drop extends PolicyType

  /**
   * @param patterns variable match patterns (any-of); empty = match all
   * @param minAgeMs / maxAgeMs age window in ms (age = now − ts);
   *                 0 maxAge = unbounded ("forever")
   */
  final case class PolicyItem(
      patterns: Seq[String],
      policy: PolicyType,
      minAgeMs: Long = 0L,
      maxAgeMs: Long = 0L,
      mutations: Seq[MutationSpec] = Nil,
      comment: String = "")

  final case class Policy(items: Seq[PolicyItem])

  private def itemMatches(item: PolicyItem, now: Column): Column = {
    val age = now - col("ts")
    val pat =
      if (item.patterns.isEmpty) lit(true)
      else item.patterns.map(VariableMatcher.compile).reduce(_ || _)
    val ageLo = age >= item.minAgeMs
    val ageHi = if (item.maxAgeMs <= 0L) lit(true) else age < item.maxAgeMs
    pat && ageLo && ageHi
  }

  /** First-match policy index per row; −1 = no match (default DROP).
    * `now` is a Column so streaming callers can pass a per-batch clock
    * (`unix_millis(current_timestamp())`) instead of a plan-time
    * constant. */
  def policyIndex(policy: Policy, now: Column): Column =
    policy.items.zipWithIndex.foldRight(lit(-1): Column) {
      case ((item, i), el) => when(itemMatches(item, now), i).otherwise(el)
    }

  def policyIndex(policy: Policy, nowMs: Long): Column =
    policyIndex(policy, lit(nowMs))

  /** True for rows the policy discards immediately — first match is a
    * DROP item, or no item matches (default DROP). The ingest-side
    * predicate (server/store.cc:428-434); the background rewrite uses
    * [[apply]]. */
  def dropsAtIngest(policy: Policy, now: Column): Column = {
    val dropIdxs = policy.items.zipWithIndex
      .collect { case (item, i) if item.policy == Drop => i }
    policyIndex(policy, now).isin((dropIdxs :+ -1).map(Integer.valueOf): _*)
  }

  def dropsAtIngest(policy: Policy, nowMs: Long): Column =
    dropsAtIngest(policy, lit(nowMs))

  /**
   * Applies the policy: returns the surviving (possibly downsampled)
   * points. Input must be the canonical point schema; the series key is
   * added if missing (mutations need it).
   */
  def apply(points: DataFrame, policy: Policy, nowMs: Long): DataFrame = {
    val withKey =
      if (points.columns.contains("skey")) points
      else Point.withSeriesKey(points)
    val outCols = Seq("name", "labels", "value_type", "ts", "dval",
      "sval", "end_ts", "skey").map(col)
    // series identity dim for re-attaching after downsample mutations
    // (which reduce to skey/ts/dval); AQE picks the join strategy
    val seriesDim = withKey
      .select(col("skey"), col("name"), col("labels"), col("value_type"))
      .dropDuplicates("skey")
    val tagged = withKey.withColumn("__policy", policyIndex(policy, nowMs))
    // All verbatim-KEEP items merge into ONE union branch: their rows
    // pass through unchanged, so a single isin filter yields the same
    // row multiset as one branch per item but reads the input once
    // instead of once per rule — at fleet config size (many KEEP
    // rules, few downsamples) the compaction job's read amplification
    // is #downsample-items + 1, not #items.
    val verbatimIdx = policy.items.zipWithIndex.collect {
      case (item, i) if item.policy == Keep && item.mutations.isEmpty => i }
    val verbatimPart =
      if (verbatimIdx.isEmpty) Nil
      else Seq(tagged
        .filter(col("__policy").isin(verbatimIdx.map(Integer.valueOf): _*))
        .select(outCols: _*))
    val downsamplePart = policy.items.zipWithIndex.collect {
      case (item, i) if item.policy == Keep && item.mutations.nonEmpty =>
        val subset = tagged.filter(col("__policy") === i).drop("__policy")
        // downsampled points are synthetic doubles: sval/end_ts null
        item.mutations.foldLeft(subset)((d, m) => m(d))
          .select(col("skey"), col("ts"), col("dval"))
          .join(seriesDim, "skey")
          .withColumn("sval", lit(null).cast("string"))
          .withColumn("end_ts", lit(null).cast("long"))
          .select(outCols: _*)
    }
    val parts = verbatimPart ++ downsamplePart
    if (parts.isEmpty)
      withKey.select(outCols: _*).filter(lit(false))
    else parts.reduce(_ unionByName _)
  }
}
